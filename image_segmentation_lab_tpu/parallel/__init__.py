from .dist import (all_reduce_scalar, barrier, get_dist_info, init_dist,
                   is_master, master_only)
from .mesh import (batch_sharding, get_mesh, make_sharded_eval_step,
                   make_sharded_metric_eval_step, make_sharded_train_step,
                   make_spatial_sharded_eval_step,
                   make_spatial_sharded_train_step, replicate, replicated,
                   shard_batch, shard_batch_spatial, spatial_sharding)
from .expert import (MOE_EP_RULES, ep_shardings, make_ep_eval_step,
                     make_ep_train_step, shard_state_ep)
from .fsdp import (fsdp_memory_fraction, fsdp_state_shardings,
                   make_fsdp_eval_step, make_fsdp_train_step,
                   shard_state_fsdp)
from .pipeline import gpipe, microbatch, stack_stage_params
from .ring import ring_attention
from .tensor import (TRANSFORMER_TP_RULES, make_tp_eval_step,
                     make_tp_train_step, shard_state_tp, tp_shardings)
from .zero import (make_zero1_train_step, shard_state_zero1,
                   zero1_memory_fraction, zero1_state_shardings)
