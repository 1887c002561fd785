"""``Sample`` and ``SampleList``: the universal data currency of the framework.

TPU-native redesign of the reference's torch-tensor containers
(mmf/common/sample.py:23,69). Here a ``Sample`` is an attribute-dict of
host-side numpy arrays (plus non-tensor metadata such as strings and token
lists), and a ``SampleList`` is the batched form: construction stacks every
array field along a new leading batch axis, so a SampleList is a
**fixed-shape dict-of-arrays pytree** — exactly the contract XLA jit wants.

Device placement is deferred: ``SampleList.pytree()`` splits out the array
fields (the part that crosses the host->device boundary via ``jax.device_put``
with a batch sharding) from string/object metadata, which stays on host.
"""

from __future__ import annotations

import collections
import collections.abc
from typing import Any, Dict, List, Union

import numpy as np

# jax arrays are accepted transparently wherever numpy arrays are
try:
    import jax
    import jax.numpy as jnp

    _ARRAY_TYPES = (np.ndarray, jax.Array)
except Exception:  # pragma: no cover
    jnp = None
    _ARRAY_TYPES = (np.ndarray,)


def _is_array(x) -> bool:
    return isinstance(x, _ARRAY_TYPES)


class Sample(collections.OrderedDict):
    """A single example: dict with attribute access.

    Mirrors mmf/common/sample.py:23-66 semantics (attr get/set, ``fields()``).
    """

    def __init__(self, init_dict=None):
        if init_dict is None:
            init_dict = {}
        super().__init__(init_dict)

    def __setattr__(self, key, value):
        if isinstance(value, collections.abc.Mapping) and not isinstance(
            value, (Sample, SampleList)
        ):
            value = Sample(value)
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(
                f"Key {key} not found in the sample. Valid choices are {self.fields()}"
            )

    def fields(self) -> List[str]:
        return list(self.keys())


class SampleList(collections.OrderedDict):
    """A batch of Samples with stacked array fields.

    Construction from a list of ``Sample``s stacks each array field along a
    new axis 0 (reference sample.py:108-134). Fields whose values are not
    arrays (strings, ints used as metadata, lists of tokens) are collected
    into python lists. Nested ``Sample`` fields become nested SampleLists.
    """

    _TENSOR_FIELD = "_tensor_field"

    def __init__(self, samples=None):
        super().__init__()
        if samples is None:
            samples = []
        if len(samples) == 0:
            return
        if _is_array(samples[0]) or isinstance(samples[0], (int, float, np.number)):
            raise TypeError("Pass in a list of Sample/dicts, not raw arrays")

        fields = samples[0].keys()
        for field in fields:
            value = samples[0][field]
            if isinstance(value, collections.abc.Mapping):
                self[field] = SampleList(
                    [
                        s[field] if isinstance(s[field], Sample) else Sample(s[field])
                        for s in samples
                    ]
                )
            elif _is_array(value):
                shapes = {tuple(np.shape(s[field])) for s in samples}
                if len(shapes) != 1:
                    raise AssertionError(
                        f"Fields for all samples must be equally sized. "
                        f"{field} is of different sizes: {sorted(shapes)}"
                    )
                self[field] = np.stack([np.asarray(s[field]) for s in samples], axis=0)
                self._set_tensor_field(field)
            elif isinstance(value, (int, np.integer)):
                self[field] = np.asarray([s[field] for s in samples], dtype=np.int32)
                self._set_tensor_field(field)
            elif isinstance(value, (float, np.floating)):
                self[field] = np.asarray([s[field] for s in samples], dtype=np.float32)
                self._set_tensor_field(field)
            else:
                self[field] = [s[field] for s in samples]

    # -- attr access ----------------------------------------------------
    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        if key.startswith("__"):  # let pickling etc. work
            raise AttributeError(key)
        try:
            return self[key]
        except KeyError:
            raise AttributeError(
                f"Key {key} not found in the SampleList. "
                f"Valid choices are {self.fields()}"
            )

    def _set_tensor_field(self, field):
        tf = super().get(SampleList._TENSOR_FIELD, None)
        if tf is None:
            tf = []
            super().__setitem__(SampleList._TENSOR_FIELD, tf)
        if field not in tf:
            tf.append(field)

    # -- API parity with reference SampleList ---------------------------
    def fields(self) -> List[str]:
        return [k for k in self.keys() if k != SampleList._TENSOR_FIELD]

    def get_fields(self, fields):
        out = SampleList()
        for f in fields:
            out.add_field(f, self[f])
        return out

    def get_field(self, field):
        return self[field]

    def get_batch_size(self) -> int:
        for k in self.fields():
            v = self[k]
            if _is_array(v):
                return int(v.shape[0])
            if isinstance(v, SampleList):
                return v.get_batch_size()
            if isinstance(v, list):
                return len(v)
        raise RuntimeError("Empty SampleList has no batch size")

    def add_field(self, field: str, data: Any):
        """Add a field, size-checking against the current batch size
        (reference sample.py:291-324)."""
        fields = self.fields()
        if len(fields) != 0:
            bs = self.get_batch_size()
            n = None
            if _is_array(data):
                n = data.shape[0] if data.ndim > 0 else None
            elif isinstance(data, SampleList):
                n = data.get_batch_size()
            elif isinstance(data, list):
                n = len(data)
            if n is not None and n != bs:
                raise AssertionError(
                    f"A batch size mismatch was detected when adding field {field}: "
                    f"expected {bs}, got {n}"
                )
        self[field] = data
        if _is_array(data):
            self._set_tensor_field(field)
        return self

    def copy(self) -> "SampleList":
        out = SampleList()
        for f in self.fields():
            out.add_field(f, self[f])
        return out

    # -- pytree split ----------------------------------------------------
    def pytree(self) -> Dict[str, Any]:
        """Return only the array-valued fields as a (possibly nested) plain
        dict: the jit-traversable part of the batch."""
        out = {}
        for k in self.fields():
            v = self[k]
            if _is_array(v):
                out[k] = v
            elif isinstance(v, SampleList):
                sub = v.pytree()
                if sub:
                    out[k] = sub
        return out

    def meta(self) -> Dict[str, Any]:
        """Non-array metadata (strings, token lists, dataset tags)."""
        out = {}
        for k in self.fields():
            v = self[k]
            if _is_array(v):
                continue
            if isinstance(v, SampleList):
                sub = v.meta()
                if sub:
                    out[k] = sub
            else:
                out[k] = v
        return out

    def to_dict(self) -> Dict[str, Any]:
        return {k: self[k] for k in self.fields()}

    def detach(self):  # arrays are immutable in JAX; parity no-op
        return self

    def to(self, device=None):
        """Move array fields to device (jax.device_put). Host metadata stays."""
        if jnp is None:
            return self
        out = SampleList()
        for k in self.fields():
            v = self[k]
            if _is_array(v):
                out.add_field(k, jax.device_put(v, device))
            elif isinstance(v, SampleList):
                out.add_field(k, v.to(device))
            else:
                out.add_field(k, v)
        return out


def convert_batch_to_sample_list(
    batch: Union[SampleList, Dict[str, Any], List[Sample]]
) -> SampleList:
    """Reference sample.py:400-419."""
    if isinstance(batch, SampleList):
        return batch
    if isinstance(batch, collections.abc.Mapping):
        sl = SampleList()
        for k, v in batch.items():
            sl.add_field(k, v)
        return sl
    return SampleList(batch)


def detach_tensor(x):
    return x
