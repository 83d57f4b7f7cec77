"""Offline inference API.

Parity target: reference ``core/inference/infer.py``: ``init_model``
(parse config, null pretrained/init_cfg, build, load checkpoint, attach
CLASSES/PALETTE metadata — :35-90), ``inference_model`` (prepare data →
forward → argmax → numpy — :93-120) and ``_prepare_data`` (:123-154).
The reference's multi-image handling is broken (it feeds a python list into
tensor ops — SURVEY.md §8.7); here batching works, grouping equal-size
images into one jitted call.

The functional twist: ``init_model`` returns an ``InferenceModel`` bundle
(module + variables + metadata) since JAX modules don't carry weights.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from ...data.pipeline import Pipeline
from ...models.builder import build_segmentor
from ..fileio import imread, parse_and_backup_config
from ..initialize import load_checkpoint

ImageType = Union[str, np.ndarray, Sequence[Union[str, np.ndarray]]]


@dataclasses.dataclass
class InferenceModel:
    model: Any
    variables: Dict[str, Any]
    cfg: Dict[str, Any]
    metadata: Optional[Dict[str, Any]] = None

    @property
    def classes(self):
        return (self.metadata or {}).get("classes")

    @property
    def palette(self):
        return (self.metadata or {}).get("palette")


def init_model(config: Union[str, Path],
               checkpoint: Optional[str] = None,
               device: str = "") -> InferenceModel:
    """Build a segmentor from a network config (+ optional checkpoint)."""
    import jax
    import jax.numpy as jnp

    if not isinstance(config, (str, Path)):
        raise TypeError(f"config must be a file path, but got {type(config)}")
    from ..fileio import require_config_key
    network_config = require_config_key(parse_and_backup_config(config),
                                        "model", config)
    # inference never needs pretrained-download init (reference infer.py:63-70)
    if network_config.get("type") == "EncoderDecoder":
        if "init_cfg" in network_config.get("backbone", {}):
            network_config["backbone"]["init_cfg"] = None
    network_config["pretrained"] = None

    model = build_segmentor(network_config)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(rngs, img, method="encode_decode")

    metadata = None
    if checkpoint is not None:
        variables, ckpt = load_checkpoint(variables, checkpoint)
        meta = ckpt.get("metadata", None)
        if meta and "CLASSES" in meta:
            metadata = {"classes": meta["CLASSES"],
                        "palette": meta.get("PALETTE")}
    return InferenceModel(model=model, variables=variables,
                          cfg=network_config, metadata=metadata)


def _prepare_data(imgs: ImageType, pipeline: Union[str, Path, None]):
    """Load + augment images (reference infer.py:123-154).

    Returns (list of (H,W,C) float arrays, data_infos, is_batch).
    """
    import jax

    pipe = Pipeline.from_yaml(pipeline) if isinstance(
        pipeline, (str, Path)) else pipeline
    is_batch = isinstance(imgs, (list, tuple))
    if not is_batch:
        imgs = [imgs]
    data_infos: Dict[str, list] = {"ori_img_size_hw": []}
    images = []
    for img in imgs:
        if isinstance(img, np.ndarray):
            arr = img
        else:
            data_infos.setdefault("img_file_path", []).append(str(img))
            arr = imread(img, channel_order="rgb")
        data_infos["ori_img_size_hw"].append(tuple(arr.shape[:2]))
        if pipe is not None:
            out, _ = pipe(jax.random.PRNGKey(0), arr[None].astype(np.float32))
            arr = np.asarray(out[0])
        images.append(arr.astype(np.float32))
    return images, data_infos, is_batch


def inference_model(inf_model: InferenceModel,
                    img: ImageType,
                    pipeline: Union[str, Path, None],
                    device: str = "") -> np.ndarray:
    """Run whole/slide inference and return the (N, H, W) class map
    (reference infer.py:93-120, fixed multi-image semantics)."""
    import jax
    import jax.numpy as jnp

    images, data_infos, is_batch = _prepare_data(img, pipeline)
    sizes = data_infos["ori_img_size_hw"]
    preds: List[np.ndarray] = []
    for im, size in zip(images, sizes):
        pred = inf_model.model.apply(
            inf_model.variables, jnp.asarray(im)[None],
            ori_img_size=tuple(size), rescale=True, method="predict")
        preds.append(np.asarray(jax.device_get(pred))[0])
    if is_batch:
        return preds
    return preds[0]


def show_result_pyplot(inf_model: InferenceModel,
                       img: Union[str, np.ndarray],
                       result: np.ndarray,
                       opacity: float = 0.5,
                       out_file: Optional[str] = None):
    """Palette overlay of a prediction (the reference's version is a gutted
    stub, infer.py:157-223; this one works)."""
    from ...models.segmentors.base import show_result

    if isinstance(img, str):
        img = imread(img, channel_order="rgb")
    return show_result(img, result, palette=inf_model.palette,
                       opacity=opacity, out_file=out_file)
