"""Inferencer base.

Parity: /root/reference/mindpose/engine/inferencer/inferencer.py:9-67. Since
networks are functional, the inferencer holds (EvalNet wrapper, variables)
and jits the device portion once; iteration is over the framework DataLoader.

Beyond the reference (which evaluates on rank 0 with the other chips idle,
callbacks/eval_callback.py:136-153): pass ``mesh`` to shard the eval batch
over the mesh's data axis so inference fans out across all devices.
"""
import logging
from typing import Any, Dict, List, Optional

import numpy as np

from ...models.networks import EvalNet


class Inferencer:
    def __init__(
        self,
        net: EvalNet,
        variables: Any = None,
        config: Optional[Dict[str, Any]] = None,
        mesh: Any = None,
    ) -> None:
        self.net = net
        self.variables = variables
        self.config = config if config else dict()
        self.mesh = mesh
        self._inference_cfg = self.load_inference_cfg()

    def _data_parallelism(self) -> int:
        """Devices along the mesh data axis (1 when unsharded)."""
        if self.mesh is None:
            return 1
        from ...parallel.mesh import DATA_AXIS

        return self.mesh.shape[DATA_AXIS]

    def _compiled_batch(self, batch_size: Optional[int]) -> Optional[int]:
        """Static device batch: batch_size rounded up to a multiple of the
        data-axis size so XLA can split it evenly across devices."""
        if not batch_size:
            return batch_size
        n = self._data_parallelism()
        return ((batch_size + n - 1) // n) * n

    def _shard_inputs(self, *arrays):
        """Place batch arrays sharded over the data axis (no-op sans mesh)."""
        import jax
        import jax.numpy as jnp

        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from ...parallel.mesh import data_sharding

        sharding = data_sharding(self.mesh)
        return tuple(jax.device_put(a, sharding) for a in arrays)

    def _place_variables(self, variables):
        """Re-place ``variables`` onto this inferencer's mesh (replicated).

        During multi-host training the train state's params are committed to
        the GLOBAL mesh by the sharded step, while eval runs on rank-0's
        local mesh (tools/train.py). Mixing the two device sets inside one
        jit raises an incompatible-devices error, so any array that is not
        fully addressable from this process is first materialized from its
        local (replicated) shard, then device_put replicated on the eval
        mesh. No-op without a mesh.
        """
        import jax

        if self.mesh is None:
            return variables
        from ...parallel.mesh import replicated_sharding

        sharding = replicated_sharding(self.mesh)

        def place(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                if not x.sharding.is_fully_replicated:
                    # a multi-host FSDP shard: the full value is spread over
                    # processes and this method may be called rank-gated, so
                    # gathering here would deadlock. The caller must run
                    # parallel.replicate_sharded(state) on ALL ranks first
                    # (EvalCallback does).
                    raise ValueError(
                        "non-replicated global array reached eval placement; "
                        "call parallel.replicate_sharded on all processes "
                        "before rank-gated inference"
                    )
                # DP training replicates params, so the local shard on the
                # first addressable device is the full array
                x = np.asarray(x.addressable_data(0))
            return jax.device_put(x, sharding)

        return jax.tree.map(place, variables)

    def load_inference_cfg(self) -> Dict[str, Any]:
        raise NotImplementedError("Child class must implement this method.")

    def infer(self, dataset) -> List[Dict[str, Any]]:
        raise NotImplementedError("Child class must implement this method.")

    def __call__(self, dataset, variables: Any = None) -> List[Dict[str, Any]]:
        if variables is not None:
            self.variables = self._place_variables(variables)
        logging.info("Start inferencing...")
        result = self.infer(dataset)
        logging.info("Start inferencing...done.")
        return result
