"""All statistical integration tests are marked ``slow``.

They establish distributional correctness with thousands of proposals
per move configuration — essential for a round gate / CI, hostile to
the edit-test loop.  Iterate with ``pytest -m "not slow"`` (the unit
tier covers contracts and shapes); full runs include them.
"""

import os

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def pytest_collection_modifyitems(items):
    # This hook fires with the whole session's items; only mark ours.
    for item in items:
        if str(item.fspath).startswith(_HERE):
            item.add_marker(pytest.mark.slow)
