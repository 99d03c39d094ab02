"""24-view CLIP-similarity metric (the paper's third metric)."""

import numpy as np

from one2345_tpu.core.config import CLIPVisionConfig


def _tiny_scorer():
    from one2345_tpu.eval.clip_metric import ClipScorer

    return ClipScorer(config=CLIPVisionConfig(
        image_size=28, patch_size=14, width=32, layers=2, heads=2,
        dtype="float32",
    ))


def _box_mesh(shift=0.0, color=(0.8, 0.2, 0.1)):
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32
    ) - 0.5 + shift
    f = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
         [3, 2, 6], [3, 6, 7], [0, 3, 7], [0, 7, 4], [1, 5, 6], [1, 6, 2]],
        np.int32,
    )
    c = np.tile(np.asarray(color, np.float32), (8, 1))
    return v, f, c


def test_identical_meshes_score_one():
    scorer = _tiny_scorer()
    mesh = _box_mesh()
    s = scorer.similarity(mesh, mesh, res=32)
    assert abs(s - 1.0) < 1e-4, s


def test_embeddings_normalized_and_similarity_bounded():
    scorer = _tiny_scorer()
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    emb = scorer.embed(imgs)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)

    a = _box_mesh(color=(0.9, 0.1, 0.1))
    b = _box_mesh(shift=0.2, color=(0.1, 0.1, 0.9))
    s = scorer.similarity(a, b, res=32)
    assert -1.0 <= s <= 1.0
    # different geometry/colors should not be bit-identical
    assert s < 1.0 - 1e-6


def test_sweep_includes_clip_metric(tmp_path):
    """run_sweep wires clip_sim per row + into the summary."""
    from one2345_tpu.eval.sweep import run_sweep
    from one2345_tpu.pipeline.runner import save_obj

    v, f, c = _box_mesh()
    pred, gt = tmp_path / "pred", tmp_path / "gt"
    pred.mkdir(), gt.mkdir()
    save_obj(str(pred / "box_ours.obj"), v, f, c)
    save_obj(str(gt / "box_gt.obj"), v, f, c)

    table = run_sweep(str(pred), str(gt), n_points=512,
                      clip_scorer=_tiny_scorer())
    assert table["n_pairs"] == 1
    assert "clip_sim" in table["per_mesh"][0]
    assert "clip_sim" in table["summary"]
    assert abs(table["summary"]["clip_sim"] - 1.0) < 1e-4
