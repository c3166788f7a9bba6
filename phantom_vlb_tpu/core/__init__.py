from phantom_vlb_tpu.core.config import Config, instantiate, load_config, to_dict
from phantom_vlb_tpu.core.dtypes import POLICIES, DtypePolicy
from phantom_vlb_tpu.core.mesh import MeshConfig, MeshEnv, build_mesh

__all__ = [
    "Config",
    "instantiate",
    "load_config",
    "to_dict",
    "DtypePolicy",
    "POLICIES",
    "MeshConfig",
    "MeshEnv",
    "build_mesh",
]
