"""comparing-baseline workflow end-to-end (scripts/demo_compare.py):
synthesize pairs -> image dirs -> metric table -> identity fixpoint +
perturbed ordering (comparing-baseline.py:88)."""

import pathlib
import sys

import pytest

SCRIPTS = pathlib.Path(__file__).resolve().parents[1] / "scripts"
sys.path.insert(0, str(SCRIPTS))


@pytest.mark.slow
def test_demo_compare_end_to_end(tmp_path):
    import demo_compare

    demo_compare.main(["--img_size", "32", "--n", "2", "--outdir", str(tmp_path)])
