"""Pytree dataclass machinery for Model/Data containers.

Design (TPU-first): the engine's containers are frozen dataclasses registered
as JAX pytrees.  Fields marked ``static=True`` go into the treedef aux data —
they are trace-time constants (sizes, index tables, type tables) that drive
XLA specialization, exactly the role the reference's host-side precompute
plays (reference: mujoco_warp/_src/types.py:979, io.py:287).  Static numpy
arrays are wrapped in a hashable view so jit can cache on them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax
import numpy as np

_T = TypeVar("_T")


def field(static: bool = False, **kwargs) -> Any:
  """Dataclass field; ``static=True`` places it in pytree aux data."""
  metadata = dict(kwargs.pop("metadata", None) or {})
  metadata["static"] = static
  return dataclasses.field(metadata=metadata, **kwargs)


class _HashableArray:
  """Immutable, hashable view of a numpy array for treedef aux data."""

  __slots__ = ("val", "_hash")

  def __init__(self, val: np.ndarray):
    self.val = val
    self._hash = hash((val.shape, val.dtype.str, val.tobytes()))

  def __hash__(self):
    return self._hash

  def __eq__(self, other):
    return (
        isinstance(other, _HashableArray)
        and self.val.shape == other.val.shape
        and self.val.dtype == other.val.dtype
        and np.array_equal(self.val, other.val)
    )

  def __repr__(self):
    return f"static({self.val!r})"


def _wrap(v):
  if isinstance(v, np.ndarray):
    return _HashableArray(v)
  if isinstance(v, tuple):
    return tuple(_wrap(x) for x in v)
  if isinstance(v, list):
    # lists are unhashable; canonicalize to tuple-marker
    return ("__list__",) + tuple(_wrap(x) for x in v)
  return v


def _unwrap(v):
  if isinstance(v, _HashableArray):
    return v.val
  if isinstance(v, tuple):
    if len(v) > 0 and v[0] == "__list__":
      return [_unwrap(x) for x in v[1:]]
    return tuple(_unwrap(x) for x in v)
  return v


def pytree_dataclass(cls: type[_T]) -> type[_T]:
  """Register a frozen dataclass as a pytree with static/dynamic split."""
  cls = dataclasses.dataclass(frozen=True)(cls)
  all_fields = dataclasses.fields(cls)
  data_names = tuple(f.name for f in all_fields if not f.metadata.get("static"))
  static_names = tuple(f.name for f in all_fields if f.metadata.get("static"))

  def flatten_with_keys(obj):
    children = tuple(
        (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_names
    )
    aux = tuple(_wrap(getattr(obj, n)) for n in static_names)
    return children, aux

  def flatten(obj):
    children = tuple(getattr(obj, n) for n in data_names)
    aux = tuple(_wrap(getattr(obj, n)) for n in static_names)
    return children, aux

  def unflatten(aux, children):
    obj = object.__new__(cls)
    for n, v in zip(data_names, children):
      object.__setattr__(obj, n, v)
    for n, v in zip(static_names, aux):
      object.__setattr__(obj, n, _unwrap(v))
    return obj

  jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

  def replace(self, **kwargs):
    return dataclasses.replace(self, **kwargs)

  cls.replace = replace
  return cls
