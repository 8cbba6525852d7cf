from fastvlm_tpu.models import fastvit, projector, qwen2  # noqa: F401
