"""Engine factory: merge eval + dataset configs, dispatch via registry.

Parity: /root/reference/mindpose/engine/factory.py:13-84.
"""
import logging
from typing import Any, Dict, List, Optional, Union

from ..models.networks import EvalNet
from ..register import entrypoint
from .evaluator.evaluator import Evaluator
from .inferencer.inferencer import Inferencer

__all__ = ["create_inferencer", "create_evaluator"]


def create_inferencer(
    net: EvalNet,
    name: str = "topdown_heatmap",
    config: Optional[Dict[str, Any]] = None,
    dataset_config: Optional[Dict[str, Any]] = None,
    **kwargs: Any,
) -> Inferencer:
    """Create an inference engine over the whole dataset."""
    config = config if config else dict()
    dataset_config = dataset_config if dataset_config else dict()
    full_config = _merge_configs(config, dataset_config)
    return entrypoint("inferencer", name)(net=net, config=full_config, **kwargs)


def create_evaluator(
    annotation_file: str,
    name: str = "topdown",
    metric: Union[str, List[str]] = "AP",
    config: Optional[Dict[str, Any]] = None,
    dataset_config: Optional[Dict[str, Any]] = None,
    **kwargs: Any,
) -> Evaluator:
    """Create an evaluation engine producing metric results."""
    config = config if config else dict()
    dataset_config = dataset_config if dataset_config else dict()
    full_config = _merge_configs(config, dataset_config)
    return entrypoint("evaluator", name)(
        annotation_file=annotation_file, metric=metric, config=full_config, **kwargs
    )


def _merge_configs(config_1: Dict[str, Any], config_2: Dict[str, Any]) -> Dict[str, Any]:
    common = set(config_1.keys()) & set(config_2.keys())
    if common:
        logging.warning("Duplicated keys found in two configs: `%s`", common)
    return {**config_1, **config_2}
