"""LongLive-TPU: a TPU-native JAX framework for frame-level autoregressive
real-time long-video generation.

Re-implements the capabilities of the LongLive system (causal Wan-1.3B DiT
distilled to 4 denoising steps, frame-sink + short-window KV attention,
streaming prompt switches via KV-recache, causal 3D-conv VAE, DMD
score-distillation training with streaming long tuning) as an idiomatic
JAX/XLA/Pallas/pjit stack:

- ``longlive_tpu.ops``      — schedulers, RoPE, attention kernels, KV ring cache
- ``longlive_tpu.models``   — causal/bidirectional DiT, causal VAE, umT5 encoder
- ``longlive_tpu.pipeline`` — jit-compiled autoregressive generation loops
- ``longlive_tpu.parallel`` — device mesh + sharding rules (dp/fsdp/sp)
- ``longlive_tpu.training`` — DMD losses, self-forcing rollout, streaming tuning
- ``longlive_tpu.utils``    — checkpoint ingestion/conversion, config, datasets
"""

__version__ = "0.1.0"
