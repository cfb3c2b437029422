"""Decoder base.

Decoders are stateless, hashable frozen dataclasses whose ``__call__`` is pure
jnp — they run on-device under ``jit`` (the reference implements them as
``nn.Cell``s: /root/reference/mindpose/models/decoders/decoder.py).
"""
import dataclasses


@dataclasses.dataclass(frozen=True)
class Decoder:
    def __call__(self, *args, **kwargs):
        raise NotImplementedError("Decoder must implement __call__.")
