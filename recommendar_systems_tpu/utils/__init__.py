from recommendar_systems_tpu.utils.configurator import Config
from recommendar_systems_tpu.utils.misc import (
    init_seed,
    early_stopping,
    dict2str,
    get_local_time,
)
