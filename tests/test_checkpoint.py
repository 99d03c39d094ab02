"""Orbax checkpoint round-trip for stage params + trainer state."""

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.core import checkpoint


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(12.0).reshape(3, 4),
        "nested": {"b": jnp.ones((2, 2), jnp.float32), "c": np.asarray([1, 2, 3])},
    }
    path = str(tmp_path / "ck")
    checkpoint.save(path, tree)
    out = checkpoint.restore(path)
    np.testing.assert_allclose(np.asarray(out["a"]), np.asarray(tree["a"]))
    np.testing.assert_allclose(
        np.asarray(out["nested"]["b"]), np.asarray(tree["nested"]["b"])
    )


def test_latest_step_dir(tmp_path):
    assert checkpoint.latest_step_dir(str(tmp_path)) is None
    for s in (5, 100, 20):
        (tmp_path / f"step_{s:06d}").mkdir()
    latest = checkpoint.latest_step_dir(str(tmp_path))
    assert latest.endswith("step_000100")


def test_safety_checker_noop_and_flags():
    from one2345_tpu.segmentation.safety import SafetyChecker

    emb = np.random.default_rng(0).normal(size=(4, 768)).astype(np.float32)
    assert not SafetyChecker().check(emb).any()

    concepts = emb[:1] + 0.001  # nearly identical to sample 0
    checker = SafetyChecker(
        concept_embeds=concepts, concept_thresholds=np.array([0.7]),
        threshold_scale=1.0,
    )
    flags = checker.check(emb)
    assert flags[0] and not flags[1:].any()
