"""Dataset + pipeline factories.

Parity: /root/reference/mindpose/data/data_factory.py:16-172 — same public
signatures (``create_dataset``/``create_pipeline``) and semantics (per-rank
sharding, shuffle on train, normalize with mean/std x 255, final-column
projection, drop_remainder on train, batch=1 for bottom-up eval), built on
the framework DataLoader instead of GeneratorDataset.

The dataset keeps NHWC images (no HWC2CHW): the device models are NHWC.
"""
import logging
from typing import Any, Dict, List, Optional, Union

from ..register import entrypoint
from .column_names import COLUMN_MAP, FINAL_COLUMN_MAP
from .loader import DataLoader

__all__ = ["create_dataset", "create_pipeline"]


def create_dataset(
    image_root: str,
    annotation_file: Optional[str] = None,
    dataset_format: str = "coco_topdown",
    is_train: bool = True,
    device_num: Optional[int] = None,
    rank_id: Optional[int] = None,
    num_workers: int = 1,
    config: Optional[Dict[str, Any]] = None,
    **kwargs: Any,
):
    """Instantiate the record dataset plus its sharding/loader context.

    Returns a dict bundle consumed by ``create_pipeline``.
    """
    kwargs = {k: v for k, v in kwargs.items() if v is not None}
    dataset = entrypoint("dataset", dataset_format)(
        image_root, annotation_file, is_train=is_train, config=config, **kwargs
    )
    return {
        "dataset": dataset,
        "dataset_format": dataset_format,
        "is_train": is_train,
        "device_num": device_num,
        "rank_id": rank_id,
        "num_workers": num_workers,
    }


def create_pipeline(
    dataset: Union[Dict[str, Any], Any],
    transforms: List[Union[str, Dict[str, Any]]],
    method: str = "topdown",
    batch_size: int = 1,
    is_train: bool = True,
    normalize: bool = True,
    normalize_mean: List[float] = [0.485, 0.456, 0.406],
    normalize_std: List[float] = [0.229, 0.224, 0.225],
    hwc_to_chw: bool = False,
    num_workers: int = 1,
    config: Optional[Dict[str, Any]] = None,
    seed: int = 0,
    final_columns: Optional[List[str]] = None,
    image_bucket: Optional[int] = None,
    decode_cache_mb: float = 0,
    frame_grouped_shuffle: bool = False,
    patch_grouped_batching: bool = False,
) -> DataLoader:
    """Build the transform pipeline and return a batched DataLoader.

    ``final_columns`` overrides the method's default projection — used by the
    on-device pipeline, which ships raw keypoints instead of host-rendered
    targets.
    """
    if isinstance(dataset, dict):
        bundle = dataset
    else:
        bundle = {
            "dataset": dataset,
            "is_train": is_train,
            "device_num": None,
            "rank_id": None,
            "num_workers": num_workers,
        }

    phase = "train" if is_train else "val"
    final_column_names = final_columns or FINAL_COLUMN_MAP[method][phase]

    transform_funcs = _convert_names_to_transform(
        transforms, is_train=is_train, config=config
    )

    if method in {"bottomup"} and not is_train and batch_size != 1:
        # variable per-image sizes can't batch (the reference's blanket rule,
        # data_factory.py:143-145) — but with a pad-to-max transform in the
        # pipeline all images share one static shape and batched device
        # decode is safe (and much faster; one compile, full MXU batches)
        names = [
            t if isinstance(t, str) else next(iter(t)) for t in transforms
        ]
        max_size = (config or {}).get("max_image_size")
        square = bool(max_size) and max_size[0] == max_size[1]
        if "bottomup_pad" not in names:
            logging.info(
                "Set batch_size = 1 for `%s` evaluation (no bottomup_pad "
                "transform -> variable image sizes).", method,
            )
            batch_size = 1
        elif not square:
            # bottomup_pad swaps its target dims for portrait images, so a
            # non-square max_image_size still yields two static shapes —
            # a mixed-orientation batch would fail to stack. Use a square
            # max_image_size to enable batched eval.
            logging.info(
                "Set batch_size = 1 for `%s` evaluation (non-square "
                "max_image_size %s pads portrait and landscape images to "
                "different shapes).", method, max_size,
            )
            batch_size = 1

    return DataLoader(
        dataset=bundle["dataset"],
        transforms=transform_funcs,
        final_columns=final_column_names,
        batch_size=batch_size,
        is_train=is_train,
        normalize=normalize,
        normalize_mean=normalize_mean,
        normalize_std=normalize_std,
        num_workers=max(num_workers, bundle.get("num_workers", 1) or 1),
        device_num=bundle.get("device_num"),
        rank_id=bundle.get("rank_id"),
        seed=seed,
        image_bucket=image_bucket,
        decode_cache_mb=decode_cache_mb,
        frame_grouped_shuffle=frame_grouped_shuffle,
        patch_grouped_batching=patch_grouped_batching,
    )


def _convert_names_to_transform(
    names_with_args: List[Union[str, Dict[str, Any]]],
    is_train: bool = True,
    config: Optional[Dict[str, Any]] = None,
):
    transforms = []
    for name_with_arg in names_with_args:
        if isinstance(name_with_arg, str):
            name, kwargs = name_with_arg, dict()
        else:
            name = list(name_with_arg.keys())[0]
            kwargs = list(name_with_arg.values())[0] or dict()
        transforms.append(
            entrypoint("transform", name)(is_train=is_train, config=config, **kwargs)
        )
    return transforms
