"""The shipped spark-submit --py-files artifact must never drift from the
source tree (ADVICE r2: a stale dist zip shipped behavior that was not the
reviewed HEAD). This test rebuilds the zip from the current sources and
compares per-member contents with the committed artifact — regenerate with
`python tools/build_pyfiles.py` after any package change."""

from __future__ import annotations

import importlib.util
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_contents(path: str) -> dict[str, bytes]:
    with zipfile.ZipFile(path) as z:
        return {n: z.read(n) for n in z.namelist() if not n.endswith("/")}


def test_dist_zip_matches_source(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "build_pyfiles", os.path.join(REPO, "tools", "build_pyfiles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fresh = mod.build(str(tmp_path / "fresh.zip"))
    committed = os.path.join(REPO, "dist", "geospatial_cuda_spark.zip")
    assert os.path.exists(committed), "dist zip missing — run tools/build_pyfiles.py"
    want = _zip_contents(fresh)
    got = _zip_contents(committed)
    assert set(got) == set(want), (
        f"dist zip member set drifted: only-in-zip={sorted(set(got) - set(want))}, "
        f"missing={sorted(set(want) - set(got))} — run tools/build_pyfiles.py"
    )
    stale = sorted(n for n in want if got[n] != want[n])
    assert not stale, f"dist zip stale for {stale} — run tools/build_pyfiles.py"
