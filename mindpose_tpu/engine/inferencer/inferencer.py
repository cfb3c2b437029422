"""Inferencer base.

Parity: /root/reference/mindpose/engine/inferencer/inferencer.py:9-67. Since
networks are functional, the inferencer holds (EvalNet wrapper, variables)
and jits the device portion once; iteration is over the framework DataLoader.
"""
import logging
from typing import Any, Dict, List, Optional

from ...models.networks import EvalNet


class Inferencer:
    def __init__(
        self,
        net: EvalNet,
        variables: Any = None,
        config: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.net = net
        self.variables = variables
        self.config = config if config else dict()
        self._inference_cfg = self.load_inference_cfg()

    def load_inference_cfg(self) -> Dict[str, Any]:
        raise NotImplementedError("Child class must implement this method.")

    def infer(self, dataset) -> List[Dict[str, Any]]:
        raise NotImplementedError("Child class must implement this method.")

    def __call__(self, dataset, variables: Any = None) -> List[Dict[str, Any]]:
        if variables is not None:
            self.variables = variables
        logging.info("Start inferencing...")
        result = self.infer(dataset)
        logging.info("Start inferencing...done.")
        return result
