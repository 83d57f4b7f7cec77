from .dist import (all_reduce_scalar, barrier, get_dist_info, init_dist,
                   is_master, master_only)
from .mesh import (batch_sharding, get_mesh, make_sharded_eval_step,
                   make_sharded_metric_eval_step, make_sharded_train_step,
                   make_spatial_sharded_eval_step,
                   make_spatial_sharded_train_step, replicate, replicated,
                   shard_batch, shard_batch_spatial, spatial_sharding)
from .pipeline import gpipe, microbatch, stack_stage_params
from .tensor import (TRANSFORMER_TP_RULES, make_tp_eval_step,
                     make_tp_train_step, shard_state_tp, tp_shardings)
from .zero import (make_zero1_train_step, shard_state_zero1,
                   zero1_memory_fraction, zero1_state_shardings)
