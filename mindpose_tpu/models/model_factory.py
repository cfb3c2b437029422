"""Model factories: create_* entrypoints resolving registry names.

Parity: /root/reference/mindpose/models/model_factory.py:24-203. The factory
wires ``backbone.out_channels`` into the neck/head input width, keeping the
one-liner ``create_network(backbone_name=..., head_name=...)`` public API.
"""
from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..register import entrypoint
from .networks import EvalNet, Net, NetWithLoss

__all__ = [
    "create_backbone",
    "create_neck",
    "create_head",
    "create_decoder",
    "create_loss",
    "create_network",
    "create_eval_network",
    "create_network_with_loss",
]


def create_backbone(
    name: str,
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    **kwargs: Any,
):
    """Create a backbone module by registry name."""
    return entrypoint("backbone", name)(
        pretrained=pretrained, ckpt_url=ckpt_url, in_channels=in_channels, **kwargs
    )


def create_head(name: str, in_channels: int, num_joints: int = 17, **kwargs: Any):
    return entrypoint("head", name)(
        in_channels=in_channels, num_joints=num_joints, **kwargs
    )


def create_neck(name: str, in_channels: int, out_channels: int, **kwargs: Any):
    return entrypoint("neck", name)(
        in_channels=in_channels, out_channels=out_channels, **kwargs
    )


def create_decoder(name: str, **kwargs: Any):
    return entrypoint("decoder", name)(**kwargs)


def create_loss(name: str, **kwargs: Any):
    # yaml lists are unhashable; freeze them so losses stay static under jit
    frozen = {
        k: tuple(tuple(x) if isinstance(x, list) else x for x in v)
        if isinstance(v, list)
        else v
        for k, v in kwargs.items()
    }
    return entrypoint("loss", name)(**frozen)


def create_network(
    backbone_name: str,
    head_name: str,
    neck_name: str = "",
    backbone_pretrained: bool = False,
    backbone_ckpt_url: str = "",
    in_channels: int = 3,
    neck_out_channels: int = 256,
    num_joints: int = 17,
    backbone_args: Optional[Dict[str, Any]] = None,
    neck_args: Optional[Dict[str, Any]] = None,
    head_args: Optional[Dict[str, Any]] = None,
    dtype: Any = jnp.float32,
) -> Net:
    """Create the training network (ref model_factory.py:108-172).

    ``dtype`` is the compute dtype (bf16 under AMP); parameters stay float32.
    Pretrained-backbone loading happens on the parameter pytree at train time
    (see utils.checkpoint.load_pretrained_backbone), not at module build.
    """
    backbone_args = dict(backbone_args or {})
    neck_args = dict(neck_args or {})
    head_args = dict(head_args or {})
    # freeze list-valued settings (e.g. with_ae_loss) for module hashability
    for args in (backbone_args, neck_args, head_args):
        for k, v in list(args.items()):
            if isinstance(v, list):
                args[k] = tuple(v)

    backbone = create_backbone(
        backbone_name,
        pretrained=backbone_pretrained,
        ckpt_url=backbone_ckpt_url,
        in_channels=in_channels,
        dtype=dtype,
        **backbone_args,
    )

    if neck_name:
        neck = create_neck(
            neck_name,
            in_channels=backbone.out_channels,
            out_channels=neck_out_channels,
            dtype=dtype,
            **neck_args,
        )
        head_in = neck.out_channels
    else:
        neck = None
        head_in = backbone.out_channels

    head = create_head(
        head_name, in_channels=head_in, num_joints=num_joints, dtype=dtype, **head_args
    )
    return Net(backbone=backbone, head=head, neck=neck)


def create_eval_network(net: Net, decoder: Any, output_raw: bool = True) -> EvalNet:
    return EvalNet(net=net, decoder=decoder, output_raw=output_raw)


def create_network_with_loss(
    net: Net, loss: Any, has_extra_inputs: bool = False
) -> NetWithLoss:
    return NetWithLoss(net=net, loss=loss, has_extra_inputs=has_extra_inputs)
