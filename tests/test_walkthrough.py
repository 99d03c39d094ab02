"""The example.ipynb-equivalent walkthrough must run end-to-end on CPU."""

import json
import os
import sys


def test_walkthrough_tiny(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import walkthrough

    out = str(tmp_path / "walk")
    walkthrough.main(["--tiny", "--out", out])

    for name in (
        "1_preprocessed.png",
        "4_stage1_grid.png",
        "5_stage2_grid.png",
        "6_mesh.ply",
        "summary.json",
    ):
        assert os.path.isfile(os.path.join(out, name)), name
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert summary["mesh_vertices"] > 0 and summary["mesh_faces"] > 0
    assert -90.0 <= summary["elevation_deg"] <= 90.0
