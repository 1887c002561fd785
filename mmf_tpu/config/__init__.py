from mmf_tpu.config import omega  # noqa: F401
from mmf_tpu.config.configuration import (  # noqa: F401
    Configuration,
    get_global_config,
    get_mmf_cache_dir,
    get_mmf_env,
    get_zoo_config,
    load_yaml,
    load_yaml_with_defaults,
)
