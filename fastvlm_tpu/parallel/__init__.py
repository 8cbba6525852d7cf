from fastvlm_tpu.parallel.mesh import make_mesh  # noqa: F401
from fastvlm_tpu.parallel import sharding  # noqa: F401
