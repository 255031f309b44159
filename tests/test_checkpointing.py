"""Orbax save/restore + auto-resume; config loading; LoRA fold."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from longlive_tpu.config import load_pipeline_config
from longlive_tpu.utils import orbax_io
from longlive_tpu.utils.checkpoint import (clean_state_dict_keys,
                                           fold_lora_into_dit_sd,
                                           unwrap_generator_checkpoint)


def test_orbax_roundtrip_and_retention(tmp_path):
    state = {
        "gen_params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7, jnp.int32),
    }
    for s in (5, 10, 15):
        orbax_io.save_train_state(str(tmp_path), s, state, max_checkpoints=2)
    assert orbax_io.list_checkpoint_steps(str(tmp_path)) == [10, 15]
    restored = orbax_io.restore_train_state(str(tmp_path), state)
    np.testing.assert_array_equal(np.asarray(restored["gen_params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert orbax_io.latest_checkpoint_step(str(tmp_path)) == 15


def test_host_opt_state_checkpoint_roundtrip(tmp_path):
    """opt_on_host keeps AdamW state as host numpy (f32 master/moments +
    python step counter); it must survive the Orbax save/restore cycle
    writable and host-resident."""
    from longlive_tpu.training.trainer import host_adamw_init, host_adamw_step

    trained = {"a": jnp.ones((4, 8), jnp.bfloat16), "b": jnp.zeros((3,), jnp.bfloat16)}
    st = host_adamw_init(trained)
    g = {"a": jnp.full((4, 8), 0.5), "b": jnp.ones((3,))}
    host_adamw_step(st, g, lr=1e-2, b1=0.9, b2=0.999, weight_decay=0.01,
                    clip=1.0, out_dtypes=[jnp.bfloat16, jnp.bfloat16])
    state = {"gen_opt": st, "step": jnp.zeros([], jnp.int32)}
    orbax_io.save_train_state(str(tmp_path), 0, state, 2)
    restored = orbax_io.restore_train_state(str(tmp_path), state)
    m0 = restored["gen_opt"]["m"]["a"]
    assert isinstance(m0, np.ndarray) and m0.dtype == np.float32
    assert int(restored["gen_opt"]["t"]) == 1
    # master must stay writable (the update mutates it in place)
    newp, _ = host_adamw_step(restored["gen_opt"], g, lr=1e-2, b1=0.9,
                              b2=0.999, weight_decay=0.01, clip=1.0,
                              out_dtypes=[jnp.bfloat16, jnp.bfloat16])
    assert int(restored["gen_opt"]["t"]) == 2
    assert jax.tree.leaves(newp)[0].dtype == jnp.bfloat16


def test_config_loading_reference_keys():
    cfg = load_pipeline_config("configs/longlive_interactive_inference.yaml")
    assert cfg.switch_frame_indices == (40, 80, 120, 160, 200)
    assert cfg.local_attn_size == 12 and cfg.sink_size == 3
    assert cfg.num_output_frames == 240 and not cfg.global_sink
    d = cfg.dit_config()
    assert d.local_attn_size == 12


def test_fsdp_key_cleaning_and_unwrap():
    sd = {"_fsdp_wrapped_module.blocks.0.ffn.0.weight": torch.ones(2, 2)}
    cleaned = clean_state_dict_keys(sd)
    assert "blocks.0.ffn.0.weight" in cleaned
    ckpt = {"generator": sd}
    assert "blocks.0.ffn.0.weight" in unwrap_generator_checkpoint(ckpt)
    ckpt_ema = {"generator_ema": sd, "generator": {}}
    assert "blocks.0.ffn.0.weight" in unwrap_generator_checkpoint(ckpt_ema, use_ema=True)


def test_lora_fold():
    base = {"blocks.0.self_attn.q.weight": torch.zeros(4, 4)}
    lora = {
        "base_model.model.blocks.0.self_attn.q.lora_A.default.weight": torch.ones(2, 4),
        "base_model.model.blocks.0.self_attn.q.lora_B.default.weight": torch.ones(4, 2),
    }
    folded = fold_lora_into_dit_sd(base, lora, alpha_over_rank=0.5)
    np.testing.assert_allclose(folded["blocks.0.self_attn.q.weight"].numpy(),
                               np.full((4, 4), 1.0))
