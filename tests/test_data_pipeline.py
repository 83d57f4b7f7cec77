"""Tests of the on-device augmentation pipeline + datasets + loader."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from image_segmentation_lab_tpu.core.dataset import (DataLoader,
                                                     SyntheticDataset)
from image_segmentation_lab_tpu.data.pipeline import Pipeline


def make_pipeline(transforms):
    return Pipeline.from_dict({
        "transform": {"__class_fullname__": "Compose", "p": 1.0,
                      "transforms": transforms}})


def test_yaml_roundtrip_and_shapes():
    p = Pipeline.from_yaml("configs/augmentation/kvasir_train_transform.yaml")
    assert p.output_shape((480, 600, 3)) == (640, 640, 3)
    imgs = np.random.RandomState(0).randint(
        0, 255, (2, 640, 640, 3)).astype(np.uint8)
    masks = np.random.RandomState(1).randint(0, 2, (2, 640, 640))
    out_img, out_mask = p(jax.random.PRNGKey(0), imgs, masks)
    assert out_img.shape == (2, 640, 640, 3)
    assert out_mask.shape == (2, 640, 640)
    # Normalize happened: values roughly standardized
    assert float(jnp.abs(out_img).max()) < 10
    assert set(np.unique(np.asarray(out_mask))) <= {0, 1}


def test_flip_determinism_and_distribution():
    spec = [{"__class_fullname__": "HorizontalFlip", "p": 0.5}]
    p = make_pipeline(spec)
    imgs = np.arange(2 * 4 * 4 * 1).reshape(2, 4, 4, 1).astype(np.uint8)
    masks = np.arange(2 * 4 * 4).reshape(2, 4, 4) % 2
    a1, m1 = p(jax.random.PRNGKey(7), imgs, masks)
    a2, m2 = p(jax.random.PRNGKey(7), imgs, masks)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # flipped or not, data preserved
    for i in range(2):
        orig = imgs[i, ..., 0].astype(np.float32)
        out = np.asarray(a1[i, ..., 0])
        assert np.array_equal(out, orig) or np.array_equal(out, orig[:, ::-1])
        # image and mask flip together
        mout = np.asarray(m1[i])
        flipped = not np.array_equal(out, orig)
        np.testing.assert_array_equal(
            mout, masks[i][:, ::-1] if flipped else masks[i])


def test_rotate_90_direction_and_mask_alignment():
    """+90 must rotate counter-clockwise (cv2/albumentations convention),
    and the mask must rotate WITH the image."""
    spec = [{"__class_fullname__": "Rotate", "p": 1.0, "limit": [90, 90]}]
    p = make_pipeline(spec)
    img = np.zeros((1, 5, 5, 1), np.float32)
    img[0, 0, :, 0] = [1, 2, 3, 4, 5]  # top row, asymmetric
    mask = np.zeros((1, 5, 5), np.float32)
    mask[0, 0, :] = 1
    out, m = p(jax.random.PRNGKey(0), img, mask)
    np.testing.assert_allclose(np.asarray(out[0, ..., 0]),
                               np.rot90(img[0, ..., 0], 1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(m[0]),
                                  np.rot90(mask[0], 1))


def test_normalize_values():
    spec = [{"__class_fullname__": "Normalize", "p": 1.0,
             "mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5],
             "max_pixel_value": 255.0}]
    p = make_pipeline(spec)
    img = np.full((1, 2, 2, 3), 255, np.uint8)
    out, _ = p(jax.random.PRNGKey(0), img, np.zeros((1, 2, 2)))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_blur_preserves_mean():
    spec = [{"__class_fullname__": "Blur", "p": 1.0, "blur_limit": [3, 7]}]
    p = make_pipeline(spec)
    img = np.random.RandomState(0).randint(0, 255, (1, 32, 32, 3)).astype(
        np.uint8)
    out, _ = p(jax.random.PRNGKey(3), img, np.zeros((1, 32, 32)))
    assert abs(float(jnp.mean(out)) - img.mean()) < 5.0
    # blurred → lower variance
    assert float(jnp.var(out)) < img.astype(np.float32).var()


def test_oneof_selects_single_branch():
    spec = [{"__class_fullname__": "OneOf", "p": 1.0, "transforms": [
        {"__class_fullname__": "HorizontalFlip", "p": 0.5},
        {"__class_fullname__": "VerticalFlip", "p": 0.5}]}]
    p = make_pipeline(spec)
    img = np.arange(16).reshape(1, 4, 4, 1).astype(np.uint8)
    mask = np.zeros((1, 4, 4))
    out, _ = p(jax.random.PRNGKey(1), img, mask)
    o = np.asarray(out[0, ..., 0])
    base = img[0, ..., 0].astype(np.float32)
    assert (np.array_equal(o, base[:, ::-1]) or np.array_equal(o, base[::-1]))


def test_synthetic_dataset_and_loader():
    ds = SyntheticDataset(
        pipeline="configs/augmentation/synthetic_train_transform.yaml",
        length=10, image_size=(64, 64))
    assert len(ds) == 10
    img, mask, infos = ds[0]
    assert img.shape == (160, 160, 3)  # cpu-resized to the pipeline size
    assert mask.shape == (160, 160)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        collate_fn=ds.collate_fn, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    images, labels, binfos = batches[0]
    assert images.shape == (4, 160, 160, 3)
    assert labels.shape == (4, 160, 160)
    assert binfos["ori_img_size_hw"] == (64, 64)
    # deterministic per-epoch shuffle
    loader2 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=0,
                         collate_fn=ds.collate_fn, drop_last=True)
    b2 = list(loader2)
    np.testing.assert_array_equal(batches[0][0], b2[0][0])


def test_dataset_custom_classes_remap(tmp_path):
    """label_map remaps class ids when a subset of CLASSES is selected."""
    from image_segmentation_lab_tpu.core.dataset.custom import CustomDataset

    class Toy(CustomDataset):
        CLASSES = ["a", "b", "c"]
        PALETTE = [[0, 0, 0], [1, 1, 1], [2, 2, 2]]

    import cv2
    img_dir = tmp_path / "img"
    ann_dir = tmp_path / "ann"
    img_dir.mkdir()
    ann_dir.mkdir()
    cv2.imwrite(str(img_dir / "x.jpg"),
                np.zeros((8, 8, 3), np.uint8))
    ann = np.array([[0, 1], [2, 1]], np.uint8).repeat(4, 0).repeat(4, 1)
    cv2.imwrite(str(ann_dir / "x.png"), ann)

    ds = Toy(pipeline="configs/augmentation/synthetic_val_transform.yaml",
             img_dir=str(img_dir), ann_dir=str(ann_dir),
             classes=["a", "c"])
    assert ds.label_map == {0: 0, 1: -1, 2: 1}
    assert ds.CLASSES == ["a", "c"]
    assert list(map(list, ds.PALETTE)) == [[0, 0, 0], [2, 2, 2]]
    _, mask, _ = ds[0]
    # remapped: b → ignore_index (the reference's uint8 masks wrap the
    # internal -1 to 255 = ignore; excluded pixels must NOT become
    # trainable labels), c → 1
    vals = set(np.unique(mask).astype(int))
    assert vals == {0, 1, 255}


def test_loader_single_worker_no_deadlock():
    """num_workers=1 must not deadlock (prefetch runs on its own thread)."""
    ds = SyntheticDataset(
        pipeline="configs/augmentation/synthetic_val_transform.yaml",
        length=6, image_size=(32, 32))
    loader = DataLoader(ds, batch_size=2, num_workers=1,
                        collate_fn=ds.collate_fn)
    assert len(list(loader)) == 3


def test_single_decode_records_ori_size(tmp_path):
    import cv2
    from image_segmentation_lab_tpu.core.dataset import KvasirSegDataset
    img_dir, ann_dir = tmp_path / "images", tmp_path / "masks"
    img_dir.mkdir(); ann_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((30, 40, 3), np.uint8))
    cv2.imwrite(str(ann_dir / "a.jpg"), np.zeros((30, 40), np.uint8))
    ds = KvasirSegDataset(
        pipeline="configs/augmentation/synthetic_val_transform.yaml",
        img_dir=str(img_dir), ann_dir=str(ann_dir), seg_map_suffix=".jpg")
    _, _, infos = ds[0]
    assert infos["ori_img_size_each"] == (30, 40)


def test_pipeline_no_mask_with_probabilistic_transforms():
    """Regression: p<1 transforms must work when masks=None (inference path)."""
    p = Pipeline.from_yaml("configs/augmentation/kvasir_train_transform.yaml")
    imgs = np.random.RandomState(0).randint(
        0, 255, (1, 64, 64, 3)).astype(np.uint8)
    out, mask = p(jax.random.PRNGKey(0), imgs)
    assert out.shape == (1, 640, 640, 3) and mask is None


def test_collate_mixed_shapes_raises():
    ds = SyntheticDataset(
        pipeline="configs/augmentation/synthetic_val_transform.yaml",
        length=2, image_size=(32, 32))
    items = [ds[0], ds[1]]
    a, m, i = items[1]
    items[1] = (a[:-8], m[:-8], i)
    with pytest.raises(ValueError, match="mixed image sizes"):
        ds.collate_fn(items)


def test_standard_datasets_registered(tmp_path):
    import cv2
    from image_segmentation_lab_tpu.core.builder import DATASET, build_from_cfg
    img_dir, ann_dir = tmp_path / "img", tmp_path / "ann"
    img_dir.mkdir(); ann_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((16, 16, 3), np.uint8))
    # ADE: raw id 0 is 'ignore', id k>0 means class k-1
    ann = np.full((16, 16), 3, np.uint8)
    ann[:4] = 0
    cv2.imwrite(str(ann_dir / "a.png"), ann)
    ds = build_from_cfg(dict(
        type="ADE20KDataset", img_dir=str(img_dir), ann_dir=str(ann_dir),
        pipeline="configs/augmentation/synthetic_val_transform.yaml"),
        DATASET)
    assert ds.num_classes == 150 and ds.reduce_zero_label
    _, mask, _ = ds[0]
    vals = set(np.unique(mask).astype(int))
    assert vals == {2, 255}  # 3 → 2, 0 → 255(ignore)
    assert "PascalVOCDataset" in DATASET


def test_benchmark_dataset_classes_registered(tmp_path):
    """The six table-backed benchmark datasets register with the right
    label contracts (suffix conventions + reduce_zero_label)."""
    import cv2
    from image_segmentation_lab_tpu.core.builder import DATASET, build_from_cfg

    for name in ("COCOStuffDataset", "LoveDADataset", "PotsdamDataset",
                 "VaihingenDataset", "iSAIDDataset", "STAREDataset",
                 "DRIVEDataset", "ChaseDB1Dataset", "HRFDataset"):
        assert name in DATASET

    import inspect
    from image_segmentation_lab_tpu.core.dataset import (COCOStuffDataset,
                                                         STAREDataset,
                                                         iSAIDDataset)

    def default(cls, arg):
        return inspect.signature(cls.__init__).parameters[arg].default

    assert default(COCOStuffDataset, "seg_map_suffix") == "_labelTrainIds.png"
    assert default(iSAIDDataset, "seg_map_suffix") == \
        "_instance_color_RGB.png"
    assert default(STAREDataset, "seg_map_suffix") == ".ah.png"
    assert len(COCOStuffDataset.CLASSES) == 171
    assert len(iSAIDDataset.CLASSES) == 16

    from image_segmentation_lab_tpu.core.dataset import (ChaseDB1Dataset,
                                                         DRIVEDataset)
    assert default(DRIVEDataset, "seg_map_suffix") == "_manual1.png"
    assert default(ChaseDB1Dataset, "seg_map_suffix") == "_1stHO.png"
    assert DRIVEDataset.CLASSES == ("background", "vessel")

    # Potsdam end-to-end: ids shift down by one, raw 0 → ignore.
    img_dir, ann_dir = tmp_path / "img", tmp_path / "ann"
    img_dir.mkdir(); ann_dir.mkdir()
    cv2.imwrite(str(img_dir / "t.png"), np.zeros((16, 16, 3), np.uint8))
    ann = np.full((16, 16), 2, np.uint8)
    ann[:4] = 0
    cv2.imwrite(str(ann_dir / "t.png"), ann)
    ds = build_from_cfg(dict(
        type="PotsdamDataset", img_dir=str(img_dir), ann_dir=str(ann_dir),
        pipeline="configs/augmentation/synthetic_val_transform.yaml"),
        DATASET)
    assert ds.num_classes == 6 and ds.reduce_zero_label
    _, mask, _ = ds[0]
    assert set(np.unique(mask).astype(int)) == {1, 255}


def test_palette_png_masks_load_as_indices(tmp_path):
    """VOC-style P-mode PNGs must yield class indices, not luminance."""
    from PIL import Image
    import cv2
    from image_segmentation_lab_tpu.core.dataset import PascalVOCDataset
    img_dir, ann_dir = tmp_path / "img", tmp_path / "ann"
    img_dir.mkdir(); ann_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((8, 8, 3), np.uint8))
    idx = np.zeros((8, 8), np.uint8)
    idx[:4] = 15  # 'person'
    idx[:, :2] = 255  # VOC ignore border
    pal_img = Image.fromarray(idx, mode="P")
    palette = np.zeros((256, 3), np.uint8)
    palette[15] = [192, 128, 128]
    palette[255] = [224, 224, 192]
    pal_img.putpalette(palette.flatten().tolist())
    pal_img.save(ann_dir / "a.png")

    ds = PascalVOCDataset(
        img_dir=str(img_dir), ann_dir=str(ann_dir),
        pipeline="configs/augmentation/synthetic_val_transform.yaml")
    _, mask, _ = ds[0]
    assert set(np.unique(mask).astype(int)) == {0, 15, 255}


def test_cpu_resize_honors_mask_interpolation(tmp_path):
    """Resize(mask_interpolation=1) must bilinear-resize the mask in the
    hoisted CPU resize (the device Resize no-ops once at target size) —
    previously nearest was hardcoded and the YAML field silently ignored."""
    import cv2
    import yaml

    from image_segmentation_lab_tpu.core.dataset.custom import CustomDataset

    spec = {"__version__": "2.0.6", "transform": {
        "__class_fullname__": "Compose", "p": 1.0, "transforms": [
            {"__class_fullname__": "Resize", "height": 8, "width": 8,
             "interpolation": 1, "mask_interpolation": 1, "p": 1.0}]}}
    pipe_path = tmp_path / "p.yaml"
    pipe_path.write_text(yaml.safe_dump(spec))

    img_dir, ann_dir = tmp_path / "img", tmp_path / "ann"
    img_dir.mkdir(); ann_dir.mkdir()
    rng = np.random.RandomState(0)
    cv2.imwrite(str(img_dir / "x.jpg"), rng.randint(0, 255, (16, 16, 3),
                                                    dtype=np.uint8))
    ann = (rng.rand(16, 16) > 0.5).astype(np.uint8)
    cv2.imwrite(str(ann_dir / "x.png"), ann)

    class Toy(CustomDataset):
        CLASSES = ["bg", "fg"]
        PALETTE = [[0, 0, 0], [1, 1, 1]]

    ds = Toy(pipeline=str(pipe_path), img_dir=str(img_dir),
             ann_dir=str(ann_dir))
    _, mask, _ = ds[0]
    ref = cv2.resize(ann.astype(np.float32), (8, 8),
                     interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(np.asarray(mask, np.float32), ref, atol=1e-5)
    assert len(np.unique(mask)) > 2  # bilinear → fractional values exist


def test_loader_close_releases_threads():
    import threading

    ds = SyntheticDataset(
        pipeline="configs/augmentation/synthetic_val_transform.yaml",
        length=4, image_size=(32, 32))
    before = threading.active_count()
    loader = DataLoader(ds, batch_size=2, num_workers=3,
                        collate_fn=ds.collate_fn)
    list(loader)
    assert threading.active_count() > before
    loader.close()
    # shutdown(wait=False): give the workers a beat to exit
    import time
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before
    # a closed loader still iterates (serial fallback)
    assert len(list(loader)) == 2
