"""Reference ``tests/unit/test_blobs.py`` — dynamic/object blob parity.

Object/string/ragged blobs run through the host-fallback object store
(emcee_tpu/hostblobs.py).  Two skip classes below.
"""

import numpy as np

from _loader import is_device_backend, load


def _ragged_numeric(args):
    spec = args.get("blob_spec")
    if spec is None:
        return False
    hdf_able, ragged, shape, func = spec
    # The one documented layout divergence: a TRACEABLE log-prob
    # returning a ragged numeric tuple keeps the native pytree layout
    # (tuple of arrays) instead of the reference's (nw, 2) object
    # array — packing would force every traced ragged-blob user
    # through the slow host path.  (Untraceable functions with the
    # same blobs DO get the reference object layout via the fallback.)
    return ragged and _is_traceable_spec(spec)


def _is_traceable_spec(spec):
    hdf_able, ragged, shape, func = spec
    try:
        out = func(np.zeros(3))
    except Exception:
        return False
    vals = out if isinstance(out, tuple) else (out,)
    try:
        return all(
            np.asarray(v).dtype.kind in "bifuc" for v in vals
        )
    except (ValueError, TypeError):
        return False


def _object_on_device_backend(args):
    spec = args.get("blob_spec")
    be = args.get("backend")
    if spec is None or be is None:
        return False
    hdf_able, ragged, shape, func = spec
    return is_device_backend(be) and not _is_traceable_spec(spec)


def _skip_pred(args):
    return _ragged_numeric(args) or _object_on_device_backend(args)


globals().update(
    load(
        "emcee.tests.unit.test_blobs",
        param_skips={
            "test_blob_shape": (
                _skip_pred,
                "traced ragged numeric tuples keep the native pytree "
                "layout (docs/migrating.md); object blobs cannot live "
                "in the HBM DeviceBackend",
            ),
        },
    )
)
