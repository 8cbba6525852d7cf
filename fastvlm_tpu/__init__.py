"""fastvlm_tpu — a TPU-native vision-language framework (JAX/XLA/Pallas/pjit).

A from-scratch reimplementation of the capabilities of apple/ml-fastvlm:
the FastViTHD hybrid vision encoder, mlp2x_gelu projector, and Qwen2-family
decoders, with a fused vision-encode -> prefill path and static KV-cache
decode, designed TPU-first (NHWC convs on the MXU, static shapes under jit,
mesh/pjit sharding for scale-out).

Layout:
    models/    FastViTHD encoder, projector, Qwen2 decoder, FastVLM glue
    ops/       conv helpers, attention, KV cache, sampling, image preprocessing
    parallel/  mesh construction + named shardings (DP/TP)
    data/      conversation templates, constants, host-side tokenization
    utils/     checkpoint import (torch/safetensors -> JAX), timers
    serve/     controller/worker serving tier
    train/     SFT trainer utilities
"""

__version__ = "0.1.0"

from fastvlm_tpu.config import (  # noqa: F401
    FastViTConfig,
    ProjectorConfig,
    Qwen2Config,
    FastVLMConfig,
)
