"""End-to-end benchmark on the real TPU chip.

Measures sustained 480p generation speed (pixel FPS including streaming VAE
decode) of the LongLive-1.3B-geometry causal DiT with frame-sink +
ring-window KV attention — the reference's headline metric (20.7 FPS on one
H100, README.md:50; 172.97 ms/latent-frame steady state, reports.md:21).

Generation runs as ONE scanned device program per segment and the VAE
decodes each segment under lax.scan, so the measurement reflects device
throughput rather than host/tunnel dispatch latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/20.7, ...}

Env knobs: BENCH_FRAMES (measured latent frames, default 30),
BENCH_BATCH (batched serving, aggregate FPS; default 1),
BENCH_SWITCHES=1 to run the measured segment with a mid-run prompt switch,
BENCH_SKIP_VAE=1 to exclude VAE decode, BENCH_INT8=1 for the quantized DiT,
BENCH_PER_STREAM_VAE=1 to decode each batched stream as a separate B=1
call (halves the decode HBM peak — the B>1 full-VAE OOM fix),
BENCH_WINDOW="local,sink" attention window (default "9,3" — the reference's
own tuned config, -6% latency with no quality drop on its H100 ablation,
reports.md:57-61; "12,3" for the shipped-yaml window).

The prompt-switch (KV-recache) latency is always measured and reported as
``switch_recache_ms`` — the reference's interactive headline
(363.88 ms avg extra per switch on H100, reports.md:17,21).

Dual-row mode (the default when neither BENCH_WINDOW nor BENCH_REUSE_KV is
set): the script runs ITSELF twice in strictly-sequential subprocesses —
the TUNED serving configuration (9/3 window + reuse-KV fast mode, each
defended by measured drift gates in PERF.md) and the REFERENCE-FAITHFUL
one (12/3 window, configs/longlive_inference.yaml `local_attn_size: 12`,
with the clean-context 5-forward commit schedule) — and prints ONE merged
JSON line whose top level is the tuned headline plus nested ``tuned`` and
``faithful`` rows, each with its own ``vs_baseline`` (VERDICT r4 weak #1:
the tuned-vs-untuned comparison must be disclosed in the artifact, not
only in docs).  Subprocesses are required for a trustworthy A/B here:
LONGLIVE_* knobs resolve at trace time inside cached jits, and two
in-process chip programs would co-schedule (see scripts/r4_attn_ab.sh).
BENCH_FAITHFUL=0 skips the second row.
"""

import json
import os
import subprocess
import sys
import time


def _wait_for_tpu(max_wait_s: float = 1500.0, probe_timeout_s: int = 90):
    """The axon TPU tunnel has multi-hour outages (PERF.md measurement
    notes); a wedged in-process jax init holds a global probe lock, so
    availability is checked in SUBPROCESSES before this process imports
    jax.  Bounded: gives up after ~25 min and lets the run fail loudly."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return  # CPU run (tests/smoke): nothing to wait for
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.devices()[0].platform == 'tpu'"],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return
            if b"AssertionError" in r.stderr:
                # a backend initialized but it is not a TPU.  Two distinct
                # cases: a dev/CI host with no TPU plugin at all (waiting
                # will not change that — fail fast downstream) vs. a TPU
                # host whose tunnel outage made init FAIL FAST into the
                # CPU fallback (must keep waiting, or the bench would
                # silently emit CPU numbers as the TPU artifact)
                import importlib.util as _ilu

                if _ilu.find_spec("axon") is None:
                    return  # no TPU plugin on this host
                # plugin present -> treat as an outage and retry below
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print(f"bench: TPU tunnel still down after {attempt} probes; "
                  "proceeding (run will fail if it stays down)",
                  file=sys.stderr, flush=True)
            return
        print(f"bench: TPU tunnel down (probe {attempt}); retrying",
              file=sys.stderr, flush=True)
        time.sleep(60)


def _dual_row_main():
    """Run the tuned and reference-faithful configurations as sequential
    subprocesses and print one merged JSON line (module docstring)."""
    rows = {}
    variants = [
        ("tuned", {}),  # inherits the tuned defaults (9/3 + reuse_kv)
        ("faithful", {"BENCH_WINDOW": "12,3", "BENCH_REUSE_KV": "0"}),
    ]
    for name, overrides in variants:
        env = dict(os.environ, BENCH_CHILD="1", **overrides)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if r.returncode != 0 or not line.startswith("{"):
            print(f"bench: {name} child failed (rc={r.returncode}); "
                  f"stdout tail: {r.stdout[-200:]!r}", file=sys.stderr,
                  flush=True)
            if name == "tuned":
                sys.exit(r.returncode or 1)
            continue
        rows[name] = json.loads(line)
    merged = dict(rows["tuned"])
    merged["tuned"] = rows["tuned"]
    if "faithful" in rows:
        merged["faithful"] = rows["faithful"]
    print(json.dumps(merged))


if __name__ == "__main__":
    if (os.environ.get("BENCH_CHILD") != "1"
            and os.environ.get("BENCH_FAITHFUL", "1") == "1"
            and "BENCH_WINDOW" not in os.environ
            and "BENCH_REUSE_KV" not in os.environ):
        _dual_row_main()
        sys.exit(0)
    _wait_for_tpu()

import jax
import jax.numpy as jnp

# persistent executable cache: cold Mosaic+XLA compiles cost minutes;
# warmed runs (CI, the driver) skip them (utils/compile_cache.py)
from longlive_tpu.utils import compile_cache as _cc  # noqa: E402

_cc.enable()


def main():
    if not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import importlib.util as _ilu

        if (_ilu.find_spec("axon") is not None
                and jax.devices()[0].platform != "tpu"):
            # TPU host whose backend fell back to CPU (tunnel outage that
            # fails fast): refuse to emit CPU throughput as a TPU artifact
            print("bench: axon plugin present but backend is "
                  f"{jax.devices()[0].platform!r} — refusing to run",
                  file=sys.stderr, flush=True)
            sys.exit(1)
    from longlive_tpu.config import DiTConfig, LatentGeometry, PipelineConfig
    from longlive_tpu.models import dit as D
    from longlive_tpu.models import vae as V
    from longlive_tpu.ops.quant import quantize_dit_params
    from longlive_tpu.pipeline import InteractiveCausalInferencePipeline

    frames = int(os.environ.get("BENCH_FRAMES", "30"))
    # BENCH_BATCH>1: batched serving (beyond the reference's B=1 — samples
    # are bit-independent, tests/test_pipeline.py batch-isolation); FPS is
    # reported as AGGREGATE pixel frames/s across the batch
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    use_switches = os.environ.get("BENCH_SWITCHES", "0") == "1"
    skip_vae = os.environ.get("BENCH_SKIP_VAE", "0") == "1"
    # int8 DiT is the default serving mode (the reference's own headline
    # quotes its quantized mode, README.md:50); BENCH_INT8=0 for pure bf16
    use_int8 = os.environ.get("BENCH_INT8", "1") == "1"
    local_attn, sink = (int(s) for s in
                        os.environ.get("BENCH_WINDOW", "9,3").split(","))

    cfg = DiTConfig(local_attn_size=local_attn, sink_size=sink)
    geom = LatentGeometry()
    warmup_frames = 6
    # BENCH_INT8_KV=1: cached keys stored int8 (quantized once at write
    # time) so attention runs int8-QK with NO per-forward K-quantize pass —
    # the design negative result #2 (PERF.md) called for
    kv_int8 = os.environ.get("BENCH_INT8_KV", "0") == "1"
    # BENCH_REUSE_KV: skip the clean-context commit pass, keeping the last
    # denoise forward's K/V (Block-Cascading-style, 5->4 forwards per
    # block, −13% latency).  DEFAULT ON since round 3: the long-horizon
    # gate passed — 240-frame full-geometry drift vs the clean-context
    # pipeline is a CONSTANT ~1.6% latent rel-RMS (per-30-frame segments
    # 1.53/1.62/1.61/1.61/1.62/1.62/1.62/1.62%, chip r3d; no compounding
    # through the KV-cache feedback), consistent with LongLive's
    # context-noise training tolerance.  BENCH_REUSE_KV=0 restores the
    # reference-faithful 5-forward schedule; final re-validation at real
    # weights stays on the standing list (PERF.md gate).
    reuse_kv = os.environ.get("BENCH_REUSE_KV", "1") == "1"
    # BENCH_RECACHE_QK8=1: the prompt-switch recache prefill runs int8-QK
    # (one-shot quantize vs O(S^2) attention — the amortization the decode
    # path lacks, PERF.md negative result #2)
    recache_qk8 = os.environ.get("BENCH_RECACHE_QK8", "0") == "1"
    # BENCH_KERNEL_CACHE: carry-resident kernel-layout KV cache — the
    # flash kernel reads the stacked [L*B*N, S_pad, D] buffer directly and
    # block K/V commit with one in-place DUS per layer, removing the
    # write-then-attend path's ~16 ms/forward KV-write tax.  Measured
    # −5.9% e2e int8 / −4.8% bf16 (chip session r2e), so the default is
    # the pipeline's AUTO rule (on whenever supported); =0/=1 forces.
    _kc = os.environ.get("BENCH_KERNEL_CACHE", "")
    kernel_cache = None if _kc == "" else _kc == "1"
    # BENCH_FUSED_ROPE: q rotates inside the flash-kernel prologue
    # (no separate rope pass over q; halfsplit layout only).  Measured
    # −1.7 ms e2e on top of kernel_cache (r2e) — default on.
    fused_rope = os.environ.get("BENCH_FUSED_ROPE", "1") == "1"
    pc = PipelineConfig(num_output_frames=warmup_frames + frames,
                        local_attn_size=local_attn, sink_size=sink,
                        global_sink=False, kv_int8=kv_int8,
                        reuse_last_denoise_kv=reuse_kv,
                        kernel_cache=(False if kv_int8 else kernel_cache),
                        fused_rope=fused_rope and not kv_int8,
                        recache_attn_impl="pallas_qk8" if recache_qk8 else None)

    # BENCH_SP>1: sequence-parallel DiT over devices 0..sp-1 (Ulysses
    # cached decode, parallel/decode_sp.py) — readies the measured ~36 FPS
    # multi-chip estimate (PERF.md addendum) for the day a slice is live.
    # kernel_cache/fused_rope are single-device modes; the pipeline's AUTO
    # rule turns them off under sp.
    sp = int(os.environ.get("BENCH_SP", "1"))
    mesh = None
    if sp > 1:
        from longlive_tpu.parallel import mesh as M

        if len(jax.devices()) < sp:
            print(f"bench: BENCH_SP={sp} but only {len(jax.devices())} "
                  "devices — refusing", file=sys.stderr, flush=True)
            sys.exit(1)
        mesh = M.make_mesh(dp=1, fsdp=1, sp=sp, devices=jax.devices()[:sp])

    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    attn_impl = "auto"
    if use_int8:
        params = quantize_dit_params(params)
    # r2c A/B: the fused single-matmul qkv projection measured ~1% SLOWER
    # e2e than separate q/k/v (519.6 vs 514.1 ms/latent-frame at 18 frames
    # — the concat output forces an extra relayout before the per-head
    # reshape), so separate projections are the default again.
    if os.environ.get("BENCH_FUSE_QKV", "0") == "1":
        from longlive_tpu.ops.quant import fuse_qkv_params

        params = fuse_qkv_params(params)
        # BENCH_INT8_ATTN=1 also runs QK^T on the int8 MXU pipe (per-token
        # Q/K quant, bf16 P/PV — ops/attention.py).  Measured r2: the
        # XLA-side quant passes cost more than the int8 QK saves
        # (558.6 vs 546.1 ms/latent-frame e2e), so bf16 attention stays
        # the default; second negative int8-attention result after the
        # round-1 SageAttention-style variant (PERF.md).
        if os.environ.get("BENCH_INT8_ATTN", "0") == "1":
            attn_impl = "pallas_qk8"
    pipe = InteractiveCausalInferencePipeline(pc, params, geometry=geom,
                                              dit_config=cfg,
                                              attn_impl=attn_impl, mesh=mesh)

    prompt_a = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cross_a = pipe.prepare_condition(prompt_a)
    cross_b = cross_a
    if use_switches:
        prompt_b = jax.random.normal(jax.random.PRNGKey(2), (batch, cfg.text_len, cfg.text_dim), jnp.bfloat16)
        cross_b = pipe.prepare_condition(prompt_b)

    vcfg = V.VAEConfig()
    vae_params = None
    if not skip_vae:
        vae_params = V.init_vae_params(jax.random.PRNGKey(3), vcfg, jnp.bfloat16)
        # int8 MXU pipe INSIDE the fused VAE conv kernel: decode 189.3 ->
        # 179.6 ms/latent-frame, e2e −10 ms of ~460 — but its own quality
        # disclosure is 37.5 dB PSNR / 1.05% pixel MAE at random weights
        # (scripts/quality_delta.py) and no real checkpoints exist here to
        # validate it.  OPT-IN until the real-weight gate in PERF.md
        # passes (round-3 revert of the r2 default: a quality-trading
        # mode must not be the default on unvalidated evidence).
        if os.environ.get("BENCH_VAE_INT8", "0") == "1":
            os.environ.setdefault("LONGLIVE_VAE_INT8", "1")
        if use_int8 and os.environ.get("BENCH_INT8_VAE", "0") == "1":
            # legacy mode: int8 wide-stage convs (-7 ms vs the bf16 XLA
            # path) — superseded by the fused bf16 conv kernel (-14 ms),
            # and MIXING the two is pathological: the pallas calls' layout
            # constraints force XLA's neighboring int8 convs into a
            # T(1,128) output layout (~5x slower; xprof-verified).
            vae_params = V.quantize_vae_params(vae_params)
        from longlive_tpu.utils import aot_cache

        decode_first = aot_cache.aot_jit(
            lambda p, z: V.vae_decode_scan(p, vcfg, z, None, True),
            key=f"bench-decode-first-{vcfg!r}")
        decode_rest = aot_cache.aot_jit(
            lambda p, z, c: V.vae_decode_scan(p, vcfg, z, c, False),
            key=f"bench-decode-rest-{vcfg!r}")

    # BENCH_PER_STREAM_VAE=1 (batch>1): decode each stream as a separate
    # B=1 VAE call with its own conv-cache chain — peak decode HBM is one
    # stream's temps instead of batch x (the B=2 full-VAE OOM fix;
    # pipeline/serve.py per_stream_decode is the serving-path analogue)
    per_stream_vae = (batch > 1 and not skip_vae and
                      os.environ.get("BENCH_PER_STREAM_VAE", "0") == "1")

    def run_segment(noise_seg, cross, cache, rng, start, vae_caches, first_seg):
        lat, cache, rng = pipe.generate_latents_scanned(
            noise_seg, cross, rng=rng, cache=cache, start_frame=start)
        pixels = None
        if not skip_vae:
            lz = lat.astype(jnp.bfloat16)
            if per_stream_vae:
                if vae_caches is None:
                    vae_caches = [None] * batch
                marks = []
                for s in range(batch):
                    if first_seg:
                        row, vae_caches[s] = decode_first(vae_params, lz[s : s + 1])
                    else:
                        row, vae_caches[s] = decode_rest(vae_params, lz[s : s + 1],
                                                         vae_caches[s])
                    # a real batched server streams each stream's pixels
                    # OFF the chip as they decode; keeping B full pixel
                    # buffers resident (2x 2.53 GB at 18 frames) is what
                    # pushed B=2 e2e past 16 GB (b2_mem_probe, r3e).
                    # Reduce to a tiny completion marker — the decode work
                    # is unchanged; the buffer frees after its decode.
                    marks.append(jnp.sum(
                        row[:, -1, :, ::64, ::64].astype(jnp.float32)))
                pixels = jnp.stack(marks)
            elif first_seg:
                pixels, vae_caches = decode_first(vae_params, lz)
            else:
                pixels, vae_caches = decode_rest(vae_params, lz, vae_caches)
        return lat, cache, rng, vae_caches, pixels

    total = warmup_frames + frames
    noise = jax.random.normal(
        jax.random.PRNGKey(4), (batch, total, geom.channels, geom.height, geom.width),
        jnp.float32)

    def full_run(measure_from_warm=True):
        rng = jax.random.PRNGKey(5)
        cache = pipe.init_cache(batch, jnp.bfloat16)
        vae_caches = None
        # warmup segment (also compiles all programs)
        lat, cache, rng, vae_caches, px = run_segment(
            noise[:, :warmup_frames], cross_a, cache, rng, 0, vae_caches, True)
        jax.block_until_ready(lat)
        if px is not None:  # force completion (per-stream mode: marker)
            _ = float(jnp.sum(px if per_stream_vae
                              else px[:, -1, :, ::64, ::64]))
        t0 = time.perf_counter()
        if use_switches:
            half = frames // 2 // 3 * 3
            lat1, cache, rng, vae_caches, px1 = run_segment(
                noise[:, warmup_frames : warmup_frames + half], cross_a, cache,
                rng, warmup_frames, vae_caches, False)
            # prompt switch with KV-recache
            s = warmup_frames + half
            n = min(cfg.local_attn_size, s)
            replay = jnp.concatenate([lat, lat1], axis=1)[:, s - n : s]
            cache = pipe._recache_fn(n, False)(pipe.params, cache, cross_b, replay,
                                               jnp.asarray(s - n, jnp.int32))
            lat2, cache, rng, vae_caches, px2 = run_segment(
                noise[:, s:], cross_b, cache, rng, s, vae_caches, False)
            last_px, last_lat = (px2, lat2)
        else:
            lat1, cache, rng, vae_caches, px1 = run_segment(
                noise[:, warmup_frames:], cross_a, cache, rng, warmup_frames,
                vae_caches, False)
            last_px, last_lat = (px1, lat1)
        jax.block_until_ready(last_lat)
        if last_px is not None:
            _ = float(jnp.sum(last_px if per_stream_vae
                              else last_px[:, -1, :, ::64, ::64]))
        return time.perf_counter() - t0

    t_compile0 = time.perf_counter()
    _ = full_run()  # first run: compiles everything
    compile_and_run = time.perf_counter() - t_compile0
    elapsed = full_run()

    def measure_switch(reps=3, replay_frames=None):
        """Prompt-switch cost = one KV-recache (a single masked prefill of
        min(local_attn, t) frames under the new prompt).  Timed as a
        dependent chain so the tunnel RTT is paid once, not per rep.
        ``replay_frames``: reduced replay window (the REACTIVE unscheduled-
        switch lever, CausalInferencePipeline.reactive_switch) — None =
        the reference-exact full window."""
        rng = jax.random.PRNGKey(7)
        cache = pipe.init_cache(batch, jnp.bfloat16)
        n_gen = -(-cfg.local_attn_size // 3) * 3 + 3
        # dedicated noise: the main buffer may be shorter than n_gen under
        # small BENCH_FRAMES (slicing would silently truncate the replay)
        sw_noise = jax.random.normal(
            jax.random.PRNGKey(8),
            (batch, n_gen, geom.channels, geom.height, geom.width), jnp.float32)
        lat, cache, rng = pipe.generate_latents_scanned(
            sw_noise, cross_a, rng=rng, cache=cache, start_frame=0)
        n = min(cfg.local_attn_size, n_gen)
        if replay_frames is not None:
            n = max(3, min(replay_frames, n) // 3 * 3)  # block-aligned
        replay = lat[:, n_gen - n :]
        start = jnp.asarray(n_gen - n, jnp.int32)
        fn = pipe._recache_fn(n, False)

        def force(c):
            leaf = jax.tree.leaves(c)[0]
            _ = float(jnp.sum(leaf[..., ::64, 0, 0].astype(jnp.float32)))

        # fn donates its cache argument — chain on each call's RETURN value
        # (recaching an already-recached cache is the same program/FLOPs);
        # the original `cache` buffer is dead after the compile call
        c = fn(pipe.params, cache, cross_b, replay, start)  # compile
        force(c)
        t0 = time.perf_counter()
        for _ in range(reps):
            c = fn(pipe.params, c, cross_b, replay, start)
        force(c)
        return (time.perf_counter() - t0) / reps * 1e3

    try:
        switch_ms = round(measure_switch(), 1)
    except Exception as e:  # B>1 HBM-edge configs: the serving numbers
        # above are already measured — report the switch as absent
        # rather than losing the run (the recache replay at batch 2
        # plus the resident caches is the one allocation that can OOM)
        print(f"bench: switch measurement failed: {str(e)[:100]}",
              file=sys.stderr, flush=True)
        switch_ms = None
    reactive_ms = None
    try:
        # reactive (unscheduled) switch at the reduced replay window
        # (BENCH_REACTIVE_FRAMES, default 6 = sink + one block at 9/3);
        # failures here must not clobber the full-window number above
        rframes = int(os.environ.get("BENCH_REACTIVE_FRAMES", "6"))
        if switch_ms is not None and 0 < rframes < min(
                cfg.local_attn_size, -(-cfg.local_attn_size // 3) * 3 + 3):
            reactive_ms = round(measure_switch(replay_frames=rframes), 1)
    except Exception as e:
        print(f"bench: reactive-switch measurement failed: {str(e)[:100]}",
              file=sys.stderr, flush=True)

    def measure_eager_stall(reps=3):
        """Viewer-visible switch stall under eager (incremental) recache:
        with scheduled switches the replay window commits chunk-by-chunk
        BEHIND generation (EagerRecache), and the LAST pre-switch block
        skips its commit pass outright (its K/V would be read by nothing —
        the switch replaces the cache), so the eager chunk takes the
        commit's place in the schedule.  The visible stall is therefore

          (nocommit block + final chunk + finish) − (steady block)

        — the EXTRA serial device time at the switch vs steady-state
        generation.  Compare against ``switch_recache_ms`` (one-shot,
        ~545 ms) and the reference's ~360 ms serial recache
        (interactive_causal_inference.py:34-106)."""
        rng = jax.random.PRNGKey(9)
        cache = pipe.init_cache(batch, jnp.bfloat16)
        fpb = pipe.frame_block
        n_gen = -(-cfg.local_attn_size // fpb) * fpb + fpb
        sw_noise = jax.random.normal(
            jax.random.PRNGKey(10),
            (batch, n_gen, geom.channels, geom.height, geom.width), jnp.float32)
        lat, cache, rng = pipe.generate_latents_scanned(
            sw_noise, cross_a, rng=rng, cache=cache, start_frame=0)
        n = min(cfg.local_attn_size, n_gen)
        if n % fpb:
            return None  # odd replay: eager mode falls back to one-shot

        def force(c):
            leaf = jax.tree.leaves(c)[0]
            _ = float(jnp.sum(leaf[..., ::64, 0, 0].astype(jnp.float32)))

        nb = jax.random.normal(
            jax.random.PRNGKey(11),
            (batch, fpb, geom.channels, geom.height, geom.width), jnp.float32)

        def time_blocks(fn, cache, rng, start0, reps):
            x0, cache, rng = fn(pipe.params, cache, cross_a, nb,
                                jnp.asarray(start0, jnp.int32), rng)  # warm
            jax.block_until_ready(x0)
            t0 = time.perf_counter()
            for i in range(reps):
                x0, cache, rng = fn(pipe.params, cache, cross_a, nb,
                                    jnp.asarray(start0 + (i + 1) * fpb,
                                                jnp.int32), rng)
            jax.block_until_ready(x0)
            return (time.perf_counter() - t0) / reps * 1e3, cache, rng

        steady_ms, cache, rng = time_blocks(pipe._block_fn, cache, rng,
                                            n_gen, reps)
        nocommit_ms, cache, rng = time_blocks(pipe._block_fn_nocommit, cache,
                                              rng, n_gen + (reps + 1) * fpb,
                                              reps)
        times = []
        for r in range(reps + 1):  # first rep warms the chunk/finish jits
            er = pipe.begin_eager_recache(batch, n_gen, jnp.bfloat16)
            fed = er.feed(cross_b, lat[:, : n_gen - fpb], 0)
            assert fed == n - fpb, (fed, n)
            jax.block_until_ready(er.cache.k)
            t0 = time.perf_counter()
            er.feed(cross_b, lat[:, n_gen - fpb :], n_gen - fpb)
            c = er.finish()
            force(c)
            times.append(time.perf_counter() - t0)
        feed_finish_ms = sum(times[1:]) / reps * 1e3
        stall = max(0.0, nocommit_ms + feed_finish_ms - steady_ms)
        print(f"bench: eager switch: steady_block={steady_ms:.1f} "
              f"nocommit_block={nocommit_ms:.1f} "
              f"feed+finish={feed_finish_ms:.1f} -> stall={stall:.1f} ms",
              file=sys.stderr, flush=True)
        return stall

    eager_stall_ms = None
    if os.environ.get("BENCH_EAGER_SWITCH", "1") == "1":
        try:
            e = measure_eager_stall()
            eager_stall_ms = None if e is None else round(e, 1)
        except Exception as e:
            print(f"bench: eager-switch measurement failed: {str(e)[:100]}",
                  file=sys.stderr, flush=True)

    pixel_frames = 4 * frames * batch  # measured segment only (post-warmup)
    fps = pixel_frames / elapsed
    baseline_fps = 20.7  # H100 reference (README.md:50)
    result = {
        "metric": "sustained 480p pixel FPS (e2e: 4-step AR denoise + streaming VAE decode)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 4),
        "ms_per_latent_frame": round(elapsed / frames * 1e3, 2),
        "latent_frames_measured": frames,
        "batch": batch,
        "sp": sp,
        "prompt_switches": 1 if use_switches else 0,
        "switch_recache_ms": switch_ms,
        "switch_visible_stall_ms": eager_stall_ms,
        "switch_reactive_stall_ms": reactive_ms,
        "attn_window": f"{local_attn},{sink}",
        "include_vae": not skip_vae,
        "int8": use_int8,
        "int8_kv": kv_int8,
        "reuse_last_denoise_kv": reuse_kv,
        "rope_layout": cfg.rope_layout,
        "contig_writes": pipe._contig,
        "recache_qk8": recache_qk8,
        "two_segment": os.environ.get("LONGLIVE_TWO_SEGMENT", "0") == "1",
        # always an int (consumers plot it numerically); auto mode = whole-Sq
        # q tile with bkv 256 (r4 default; see ops/attention._auto_block_q)
        "block_kv": (int(os.environ["LONGLIVE_BKV"])
                     if os.environ.get("LONGLIVE_BKV") else 256),
        "block_kv_mode": ("env" if os.environ.get("LONGLIVE_BKV")
                          else "auto(bq4680)"),
        "kernel_cache": pipe.kernel_cache,
        "fused_rope": fused_rope,
        "vae_subpixel": os.environ.get("LONGLIVE_VAE_SUBPIXEL", "1") == "1",
        "vae_int8": (not skip_vae
                     and os.environ.get("LONGLIVE_VAE_INT8", "0") == "1"),
        "first_run_s": round(compile_and_run, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
