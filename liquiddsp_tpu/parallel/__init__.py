from liquiddsp_tpu.parallel import halo, mesh  # noqa: F401
from liquiddsp_tpu.parallel.mesh import make_mesh, channel_sharding  # noqa: F401
from liquiddsp_tpu.parallel.halo import sharded_framesync  # noqa: F401
