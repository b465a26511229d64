"""Chain storage backends (reference ``/root/reference/src/emcee/backends/``)."""

from . import pt
from .backend import Backend
from .device import DeviceBackend
from .hdf import HDFBackend, TempHDFBackend, merge_shards
from .pt import PTBackend, PTDeviceBackend, PTHDFBackend

__all__ = [
    "Backend",
    "DeviceBackend",
    "HDFBackend",
    "TempHDFBackend",
    "merge_shards",
    "PTBackend",
    "PTDeviceBackend",
    "PTHDFBackend",
    "pt",
    "get_test_backends",
]


def get_test_backends():
    """Backends to parametrize tests over (reference ``backends/__init__.py``)."""
    backends = [Backend, DeviceBackend]
    try:
        import h5py  # noqa: F401

        backends.append(TempHDFBackend)
    except ImportError:
        pass
    return backends
