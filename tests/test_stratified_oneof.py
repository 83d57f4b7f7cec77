"""Stratified batched branch execution (data/transforms.py).

The Kvasir YAML is built of OneOf groups; under the old vmapped
``lax.switch`` every branch computed for every image (Rotate's patch
gather ran on the full batch although only ~1/3 of images rotate).
``Transform.batched``/``OneOf.batched`` instead partition the batch into
static-size sub-batches via a device-side permutation and run each branch
only on its slice.  These tests pin:

* the largest-remainder apportionment (static group sizes),
* exactly-one-branch-per-image semantics + batch-order preservation,
* per-image marginals (uniform assignment via the permutation),
* the ``ISLT_NO_STRATIFIED_ONEOF`` exact-marginals fallback,
* p<1 leaf stratification (fixed transformed-count per batch).

Reference semantics being approximated: albumentations' OneOf picks a
child independently per image (core/dataset/custom.py:88 executes the
YAML); stratification quantizes the marginal to counts/n (|err| < 1/n),
documented in the transforms module.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.data import transforms as T


class _AddConst(T.Transform):
    """Leaf test transform: adds a constant (identifies which branch ran)."""

    def __init__(self, c, p=0.5):
        super().__init__(p=p)
        self.c = float(c)

    def apply(self, key, img, mask):
        return img + self.c, mask


def test_apportion_largest_remainder():
    assert T._apportion(8, [1 / 3, 1 / 3, 1 / 3]) == [3, 3, 2]
    assert T._apportion(9, [1 / 3, 1 / 3, 1 / 3]) == [3, 3, 3]
    assert T._apportion(8, [0.1, 0.9]) == [1, 7]
    assert T._apportion(2, [1 / 3, 1 / 3, 1 / 3]) == [1, 1, 0]
    assert T._apportion(5, [0.5, 0.5]) == [3, 2]
    assert sum(T._apportion(7, [0.2, 0.3, 0.5])) == 7


def test_oneof_batched_exactly_one_branch_and_order():
    one = T.OneOf([_AddConst(1), _AddConst(2), _AddConst(3)], p=1.0)
    n = 12
    # image i is the constant image 100*i: order preservation is checkable
    imgs = jnp.broadcast_to(
        100.0 * jnp.arange(n)[:, None, None, None], (n, 4, 4, 3))
    masks = jnp.broadcast_to(jnp.arange(n)[:, None, None].astype(jnp.float32),
                             (n, 4, 4))
    out, om = one.batched(jax.random.PRNGKey(0), imgs, masks)
    deltas = np.asarray(out[:, 0, 0, 0]) - 100.0 * np.arange(n)
    # each image got exactly one branch's constant, order preserved
    assert set(np.round(deltas).astype(int)) <= {1, 2, 3}
    counts = [int((np.round(deltas) == c).sum()) for c in (1, 2, 3)]
    assert counts == [4, 4, 4]
    # masks ride along with the same permutation (order restored)
    np.testing.assert_array_equal(np.asarray(om[:, 0, 0]), np.arange(n))


def test_oneof_batched_marginals_uniform_over_images():
    one = T.OneOf([_AddConst(1), _AddConst(2)], p=1.0)
    n, trials = 6, 300
    imgs = jnp.zeros((n, 2, 2, 3))
    got = np.zeros((n,))
    for t in range(trials):
        out, _ = one.batched(jax.random.PRNGKey(t), imgs, None)
        got += (np.asarray(out[:, 0, 0, 0]) == 1.0)
    freq = got / trials  # expect counts/n = 3/6 = 0.5 per image
    np.testing.assert_allclose(freq, 0.5, atol=0.1)


def test_oneof_gated_adds_identity_branch():
    one = T.OneOf([_AddConst(5)], p=0.5)
    imgs = jnp.zeros((8, 2, 2, 3))
    out, _ = one.batched(jax.random.PRNGKey(3), imgs, None)
    vals = np.asarray(out[:, 0, 0, 0])
    assert int((vals == 5.0).sum()) == 4  # exactly n*p transformed
    assert int((vals == 0.0).sum()) == 4


def test_p_gated_leaf_is_stratified_with_fixed_count():
    t = _AddConst(7, p=0.25)
    imgs = jnp.zeros((8, 2, 2, 3))
    out, _ = t.batched(jax.random.PRNGKey(1), imgs, None)
    vals = np.asarray(out[:, 0, 0, 0])
    assert int((vals == 7.0).sum()) == 2  # round(8 * 0.25)


def test_zero_quota_falls_back_to_per_image_bernoulli():
    """A p=0.1 transform at batch 4 apportions to 0 slots — stratified
    execution would deterministically KILL the augmentation (it would
    never fire).  The batched path must fall back to exact per-image
    Bernoulli gating so the transform still fires with probability ~p."""
    t = _AddConst(9, p=0.1)
    imgs = jnp.zeros((4, 2, 2, 3))
    fired = 0
    trials = 500
    for k in range(trials):
        out, _ = t.batched(jax.random.PRNGKey(k), imgs, None)
        fired += int((np.asarray(out[:, 0, 0, 0]) == 9.0).sum())
    rate = fired / (trials * 4)
    assert 0.06 < rate < 0.14, rate  # ~Bernoulli(0.1), NOT 0


def test_zero_quota_oneof_falls_back():
    """Same guard for OneOf: a branch whose weight rounds to 0 slots at
    this batch size must not be silently dead."""
    one = T.OneOf([_AddConst(1, p=0.9), _AddConst(2, p=0.05),
                   _AddConst(3, p=0.05)], p=1.0)
    imgs = jnp.zeros((4, 2, 2, 3))
    seen = set()
    for k in range(300):
        out, _ = one.batched(jax.random.PRNGKey(k), imgs, None)
        seen |= set(np.asarray(out[:, 0, 0, 0]).round().astype(int))
    assert seen == {1, 2, 3}, seen  # low-weight branches still occur


def test_no_stratify_env_falls_back_to_per_image(monkeypatch):
    monkeypatch.setenv("ISLT_NO_STRATIFIED_ONEOF", "1")
    one = T.OneOf([_AddConst(1), _AddConst(2)], p=1.0)
    n, trials = 4, 400
    imgs = jnp.zeros((n, 2, 2, 3))
    ones = 0
    per_batch_counts = set()
    for t in range(trials):
        out, _ = one.batched(jax.random.PRNGKey(t), imgs, None)
        c = int((np.asarray(out[:, 0, 0, 0]) == 1.0).sum())
        ones += c
        per_batch_counts.add(c)
    # independent per-image choice: batch counts vary (not fixed at 2)
    assert len(per_batch_counts) > 1
    np.testing.assert_allclose(ones / (trials * n), 0.5, atol=0.05)


def test_container_child_force_applies_on_its_slice():
    """A Compose child of a OneOf is force-applied (container gate
    bypassed, children keep their own p gates) on its static sub-batch."""
    inner = T.Compose([_AddConst(1, p=1.0)], p=1.0)
    one = T.OneOf([inner, _AddConst(2, p=1.0)], p=1.0)
    imgs = jnp.zeros((4, 2, 2, 3))
    out, _ = one.batched(jax.random.PRNGKey(0), imgs, None)
    vals = np.asarray(out[:, 0, 0, 0]).round().astype(int)
    assert sorted(vals.tolist()) == [1, 1, 2, 2]


def test_resize_same_size_is_identity():
    r = T.Resize(height=8, width=8, p=1.0)
    img = jnp.asarray(np.random.RandomState(0).rand(8, 8, 3), jnp.float32)
    mask = jnp.asarray(np.random.RandomState(1).randint(0, 2, (8, 8)),
                       jnp.float32)
    oi, om = r.apply(jax.random.PRNGKey(0), img, mask)
    assert oi is img and om is mask


def test_kvasir_yaml_batched_runs_and_matches_shapes():
    from image_segmentation_lab_tpu.data.pipeline import Pipeline
    p = Pipeline.from_yaml("configs/augmentation/kvasir_train_transform.yaml")
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    masks = rng.randint(0, 2, (4, 64, 64)).astype(np.int32)
    out, om = p(jax.random.PRNGKey(0), imgs, masks)
    assert out.shape == (4, 640, 640, 3) and out.dtype == jnp.float32
    assert om.shape == (4, 640, 640) and om.dtype == jnp.int32
    assert set(np.unique(np.asarray(om))) <= {0, 1}
