"""Model surgery helpers.

Parity target: reference ``models/utils/operations.py:24-72``
(``revert_sync_batchnorm`` + ``_BatchNormXd``): torch's SyncBatchNorm only
runs inside a process group, so CPU inference needs every SyncBN swapped for
a dimension-agnostic BatchNorm.

In this framework the entire mechanism is **vacuous by construction**:
``SyncBatchNorm`` *is* ``BatchNorm`` (one class, cross-replica statistics
fall out of pjit — see ``models/basic/normalization.py``), and the same
compiled module runs on TPU, CPU, or a single chip unchanged.  The function
is kept so reference-derived code calling it keeps working.
"""

from __future__ import annotations


def revert_sync_batchnorm(module):
    """No-op: SyncBatchNorm ≡ BatchNorm here (see module docstring)."""
    return module
