"""True multi-process distributed proof (2 processes x 4 CPU devices).

Every prior distributed artifact ran inside ONE process on a virtual mesh;
this exercises the layers only a real multi-controller run touches
(reference comparator: torchrun x8 + init_process_group,
/root/reference/utils/distributed.py:75-88, inference.py:43-48):

  1. DCN-path rendezvous: ``jax.distributed.initialize`` with explicit
     coordinator/num_processes/process_id (the run_train hook) + gloo CPU
     cross-process collectives.
  2. The TRAIN CLI itself (python -m longlive_tpu.run_train) over a
     process-spanning (dp=2, fsdp=4) mesh: per-host prompt rows
     (epoch_shard) and per-host noise shards assembled into global
     dp-sharded batches; finite losses on both ranks.
  3. Cross-process Orbax save + auto-resume ACROSS A PROCESS RESTART
     (second launch restores the step and continues).
  4. A serving segment: dp-sharded batched AR generation (params
     replicated, KV cache batch-sharded over dp) including a mid-run
     prompt-switch KV-recache, as one global SPMD program.

Parent mode runs all phases and writes MULTIPROC_r03.json at the repo
root.  Usage:  python scripts/multiproc_sim.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_env(proc_id: int, port: int) -> dict:
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": ("--xla_force_host_platform_device_count=4"
                      " --xla_cpu_collective_timeout_seconds=1200"),
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "JAX_PROCESS_ID": str(proc_id),
        "LONGLIVE_AOT": "0",
        "PYTHONPATH": f"{env.get('PYTHONPATH', '/root/.axon_site')}:{REPO}",
    })
    return env


def _run_pair(cmd_for, port: int, timeout: int = 900, retries: int = 2):
    """Launch the two ranks, wait, return (rc0, rc1, out0, out1).

    Gloo pair/rendezvous setup can time out when the host is heavily
    loaded (these sims share a box with chip-probe paging); such failures
    are infrastructure flakes, not code failures — retry on a fresh port."""
    for attempt in range(retries + 1):
        procs = []
        for i in range(2):
            procs.append(subprocess.Popen(
                cmd_for(i), env=_child_env(i, port + attempt * 10), cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs = []
        rcs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                out += "\n<TIMEOUT>"
            outs.append(out)
            rcs.append(p.returncode)
        flaky = any("Gloo context initialization failed" in o
                    or "DEADLINE_EXCEEDED" in o for o in outs)
        if rcs == [0, 0] or not flaky or attempt == retries:
            return rcs, outs
        print(f"(gloo rendezvous flake; retry {attempt + 1})", flush=True)
    return rcs, outs


# -- child: serving segment ------------------------------------------------

def serve_child():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]))
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils as mh
    from jax.sharding import NamedSharding, PartitionSpec as P

    # establish the gloo context while ranks are in lockstep (see run_train)
    mh.sync_global_devices("serve_sim_start")

    from longlive_tpu.config import PipelineConfig, tiny_dit_config, tiny_geometry
    from longlive_tpu.models import dit as D
    from longlive_tpu.parallel import mesh as M
    from longlive_tpu.pipeline import CausalInferencePipeline

    assert jax.device_count() == 8 and jax.local_device_count() == 4
    pid = jax.process_index()
    mesh = M.make_mesh(dp=2, fsdp=4)
    cfg, geom = tiny_dit_config(), tiny_geometry()
    pc = PipelineConfig(num_output_frames=8, local_attn_size=4, sink_size=2,
                        num_frame_per_block=cfg.num_frame_per_block)
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32,
                               zero_head=False)
    params = jax.device_put(params, NamedSharding(mesh, P()))  # replicated
    pipe = CausalInferencePipeline(pc, params, geometry=geom, dit_config=cfg,
                                   attn_impl="xla")

    def glob(x, spec):
        return mh.host_local_array_to_global_array(np.asarray(x), mesh, spec)

    # per-host prompt shard (this host's stream of the global batch of 2)
    emb_a = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), pid),
                              (1, cfg.text_len, cfg.text_dim), jnp.float32)
    emb_b = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(2), pid),
                              (1, cfg.text_len, cfg.text_dim), jnp.float32)
    cross_a = pipe.prepare_condition(glob(emb_a, P("dp")))
    cross_b = pipe.prepare_condition(glob(emb_b, P("dp")))

    cache = pipe.init_cache(2, jnp.float32)
    cache = jax.tree.map(
        lambda x: jax.device_put(
            np.asarray(x),
            NamedSharding(mesh, P(None, "dp") if x.ndim >= 2 else P())),
        cache)
    noise = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(3), pid),
                              (1, 8, geom.channels, geom.height, geom.width),
                              jnp.float32)
    noise = glob(noise, P("dp"))

    lat1, cache, rng = pipe.generate_latents_scanned(
        noise[:, :4], cross_a, cache=cache, start_frame=0)
    # prompt switch: KV-recache under the new prompt, then continue
    n = min(pc.local_attn_size, 4)
    cache = pipe._recache_fn(n, False)(
        pipe.params, cache, cross_b, lat1[:, 4 - n:],
        jnp.asarray(4 - n, jnp.int32))
    lat2, cache, rng = pipe.generate_latents_scanned(
        noise[:, 4:], cross_b, rng=rng, cache=cache, start_frame=4)
    ok = bool(jax.jit(lambda a, b: jnp.isfinite(a).all() & jnp.isfinite(b).all())(
        lat1, lat2))
    print(f"[serve p{pid}] finite={ok} lat={tuple(lat2.shape)} "
          f"sharding={lat2.sharding.spec}", flush=True)
    assert ok
    print(f"[serve p{pid}] SERVE_OK", flush=True)


# -- parent ----------------------------------------------------------------

TRAIN_YAML = """\
tiny_debug: true
distribution_loss: dmd
parallel: {{dp: 2, fsdp: 4}}
image_or_video_shape: [2, 4, 4, 8, 8]
num_training_frames: 4
min_num_training_frames: 4
slice_last_frames: 4
denoising_step_list: [1000, 750, 500, 250]
max_iters: {max_iters}
log_iters: 2
ema_on_host: false
seed: 0
data_path: {data_path}
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", choices=["serve"], default=None)
    args = ap.parse_args()
    if args.child == "serve":
        serve_child()
        return

    work = tempfile.mkdtemp(prefix="multiproc_sim_")
    logdir = os.path.join(work, "ckpt")
    data_path = os.path.join(work, "prompts.txt")
    with open(data_path, "w") as f:
        f.write("a red car drives through rain\n"
                "a lighthouse at dusk\n"
                "waves crash on black sand\n"
                "a fox runs across snow\n")
    result = {"n_processes": 2, "devices_per_process": 4, "phases": {}}

    def train_cmd(max_iters):
        yaml_path = os.path.join(work, f"train_{max_iters}.yaml")
        with open(yaml_path, "w") as f:
            f.write(TRAIN_YAML.format(max_iters=max_iters, data_path=data_path))
        return lambda i: [sys.executable, "-m", "longlive_tpu.run_train",
                          "--config_path", yaml_path, "--logdir", logdir]

    print("=== phase 1: train CLI, 2 procs x 4 devices (dp=2, fsdp=4) ===")
    base_cmd = train_cmd(3)
    rcs, outs = _run_pair(  # no_auto_resume: a flake-retry must retrain
        lambda i: base_cmd(i) + ["--no_auto_resume"], port=12361)
    for i, o in enumerate(outs):
        sys.stdout.write("".join(f"[p{i}] {ln}\n" for ln in o.splitlines()[-8:]))
    losses_seen = all("critic_loss" in o for o in outs)
    ok1 = rcs == [0, 0] and losses_seen
    result["phases"]["train_2proc"] = {
        "rc": rcs, "finite_losses_on_both_ranks": losses_seen, "ok": ok1}
    if not ok1:
        _fail(result, outs, work)

    ckpts = sorted(os.listdir(logdir)) if os.path.isdir(logdir) else []
    print("checkpoints after phase 1:", ckpts)

    print("=== phase 2: process restart + cross-process auto-resume ===")
    rcs, outs = _run_pair(train_cmd(5), port=12362)
    resumed = all("[resume] restored step" in o for o in outs)
    # mid-epoch data-loader resume (ShardedCheckpointableLoader): each rank
    # restores its own per-host position saved beside the checkpoint
    loader_resumed = all("[resume] loader at epoch" in o for o in outs)
    ok2 = rcs == [0, 0] and resumed
    for i, o in enumerate(outs):
        sys.stdout.write("".join(f"[p{i}] {ln}\n" for ln in o.splitlines()[-6:]))
    result["phases"]["restart_resume"] = {
        "rc": rcs, "resumed_on_both_ranks": resumed,
        "loader_mid_epoch_resume_on_both_ranks": loader_resumed,
        "checkpoints": ckpts, "ok": ok2}
    if not ok2:
        _fail(result, outs, work)

    print("=== phase 3: dp-sharded serving segment with prompt switch ===")
    serve_cmd = lambda i: [sys.executable, os.path.abspath(__file__),
                           "--child", "serve"]
    rcs, outs = _run_pair(serve_cmd, port=12363)
    served = all("SERVE_OK" in o for o in outs)
    ok3 = rcs == [0, 0] and served
    for i, o in enumerate(outs):
        sys.stdout.write("".join(f"[p{i}] {ln}\n" for ln in o.splitlines()[-4:]))
    result["phases"]["serve_dp_sharded_with_switch"] = {
        "rc": rcs, "ok": ok3}

    result["ok"] = ok1 and ok2 and ok3
    out_path = os.path.join(REPO, "MULTIPROC_r03.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out_path, "ok =", result["ok"])
    shutil.rmtree(work, ignore_errors=True)
    sys.exit(0 if result["ok"] else 1)


def _fail(result, outs, work):
    out_path = os.path.join(REPO, "MULTIPROC_r03.json")
    result["ok"] = False
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    for i, o in enumerate(outs):
        print(f"--- rank {i} full output ---")
        print(o[-4000:])
    print("FAILED; work dir kept:", work)
    sys.exit(1)


if __name__ == "__main__":
    main()
