from . import init_functions
from .checkpoint import (apply_to, load_checkpoint, load_checkpoint_to_params,
                         load_checkpoint_with_prefix, load_state_dict,
                         save_checkpoint, state_dict_from_variables,
                         wait_for_async_save, weights_to_cpu)
from .init_functions import bias_init_with_prob, calculate_gain
from .seed_init import (get_root_key, init_random_seed, next_rng_key,
                        set_random_seed)
from .weight_init import (BaseInit, Caffe2XavierInit, ConstantInit,
                          KaimingInit, NormalInit, PretrainedInit,
                          TruncNormalInit, UniformInit, XavierInit,
                          dump_init_info, flatten_params, get_init_info,
                          initialize, initialize_from_network_cfg,
                          reset_init_info, unflatten_params,
                          update_init_info)
