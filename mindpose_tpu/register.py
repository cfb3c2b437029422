"""Global component registry.

A two-level (module, component) name -> factory map. This is the string API
through which configs resolve backbones, heads, losses, datasets, transforms,
inferencers, evaluators, optimizers and lr schedulers.

Mirrors the public semantics of the reference registry
(/root/reference/mindpose/register.py:12-59): functions are registered under
their ``__name__`` and, optionally, one extra name; re-registration logs a
warning and overwrites.
"""
import logging
from collections import defaultdict
from typing import Any, Callable, Dict, List

_module_to_components: Dict[str, set] = defaultdict(set)
_components_to_module: Dict[str, str] = {}
_entrypoints: Dict[str, Dict[str, Callable[..., Any]]] = defaultdict(dict)


def _global_register(module_name: str, func_name: str, fn: Callable[..., Any]) -> None:
    if func_name in _entrypoints[module_name]:
        logging.warning("`%s` is already registered in `%s`", func_name, module_name)
    _entrypoints[module_name][func_name] = fn
    _components_to_module[func_name] = module_name
    _module_to_components[module_name].add(func_name)


def register(module_name: str, extra_name: str = "") -> Callable[..., Any]:
    """Register a component factory under ``module_name``.

    The factory is registered with its ``__name__``; if ``extra_name`` is
    given it is registered a second time under that name.
    """

    def wrapper(fn: Callable[..., Any]) -> Callable[..., Any]:
        _global_register(module_name, fn.__name__, fn)
        if extra_name and extra_name != fn.__name__:
            _global_register(module_name, extra_name, fn)
        return fn

    return wrapper


def list_components(module: str) -> List[str]:
    """All registered component names in a module, sorted."""
    return sorted(_module_to_components[module])


def list_modules() -> List[str]:
    """All module namespaces that have at least one component."""
    return sorted(_module_to_components.keys())


def entrypoint(module_name: str, component_name: str) -> Callable[..., Any]:
    """Resolve a (module, component) pair to its factory."""
    if module_name not in _entrypoints:
        raise ValueError(
            f"Unknown module `{module_name}`. Supported modules: {list_modules()}"
        )
    if component_name not in _entrypoints[module_name]:
        raise ValueError(
            f"Unknown component `{component_name}`. Supported components in "
            f"`{module_name}`: {list_components(module_name)}"
        )
    return _entrypoints[module_name][component_name]


def has_component(module_name: str, component_name: str) -> bool:
    """Whether a component is registered."""
    return component_name in _entrypoints.get(module_name, {})
