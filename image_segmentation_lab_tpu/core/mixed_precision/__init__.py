from .policy import (Policy, amp_policy, cast_tensor_type, get_policy,
                     policy_scope, set_policy)

__all__ = ["Policy", "amp_policy", "cast_tensor_type", "get_policy",
           "policy_scope", "set_policy"]
