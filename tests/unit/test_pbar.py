"""Progress-bar selection (reference ``tests/unit/test_pbar.py``)."""

from emcee_tpu.pbar import _NoOpPBar, get_progress_bar


def test_noop():
    with get_progress_bar(False, 10) as bar:
        assert isinstance(bar, _NoOpPBar)
        bar.update(1)


def test_tqdm_selected():
    import tqdm

    with get_progress_bar(True, 10) as bar:
        assert isinstance(bar, tqdm.tqdm)
        bar.update(3)
