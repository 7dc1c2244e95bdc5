"""Checkpoint/resume across all accumulating integrators.

The reference has no checkpointing (SURVEY.md section 5); these tests
gate the TPU framework's guarantee: a crash mid-render resumes
bit-deterministically because sample streams are counter-based on the
absolute sample index.
"""

import numpy as np
import pytest

from gdpt_tpu.integrators import render as R
from gdpt_tpu.scene import presets
from gdpt_tpu.utils import checkpoint


def _partial_checkpoint(render_partial, path, fp):
    """Render only the first k samples, persist the raw accumulator as a
    checkpoint — the state a crash mid-render would have left behind."""
    captured = {}

    def capture(acc, done):
        captured["acc"], captured["done"] = acc.copy(), done

    render_partial(capture)
    checkpoint.save_checkpoint(path, captured["acc"], captured["done"], fp)
    return captured["done"]


def test_path_partial_resume_matches_uninterrupted(tmp_path):
    from gdpt_tpu.integrators import path_soa

    sc = presets.cornell_box(width=8, height=8, spp=8, max_depth=3)
    path = str(tmp_path / "ck.npz")
    fp = checkpoint._fingerprint(sc, 8, 0)
    done = _partial_checkpoint(
        lambda cb: path_soa.render_soa(sc, spp=4, seed=0, on_chunk=cb),
        path, fp)
    assert done == 4
    resumed = checkpoint.render_with_checkpoints(sc, spp=8, seed=0,
                                                 every=4, path=path)
    straight = R.render(sc, spp=8, seed=0)
    np.testing.assert_allclose(resumed, straight, atol=1e-6)


def test_gradpath_partial_resume_matches_uninterrupted(tmp_path):
    from gdpt_tpu.integrators import gdpt_soa

    sc = presets.cornell_box(width=8, height=8, spp=4, max_depth=3,
                             integrator="gradpath")
    assert gdpt_soa.supports_soa_gdpt(sc)
    path = str(tmp_path / "ck.npz")
    fp = checkpoint._fingerprint(sc, 4, 0)
    _partial_checkpoint(
        lambda cb: gdpt_soa.render_gradpath_soa(sc, spp=2, seed=0,
                                                on_chunk=cb),
        path, fp)
    resumed = checkpoint.render_with_checkpoints(sc, spp=4, seed=0,
                                                 every=2, path=path)
    straight = gdpt_soa.render_gradpath_soa(sc, spp=4, seed=0)
    np.testing.assert_allclose(resumed, straight, atol=1e-6)


def test_volpath_partial_resume_matches_uninterrupted(tmp_path):
    from gdpt_tpu.integrators import volpath_soa

    sc = presets.volpath_scene(version=6, width=8, height=8, spp=4,
                               max_depth=3, hetero=True)
    assert volpath_soa.supports_soa_volpath(sc)
    path = str(tmp_path / "ck.npz")
    fp = checkpoint._fingerprint(sc, 4, 0)
    _partial_checkpoint(
        lambda cb: volpath_soa.render_volpath_soa(sc, spp=2, seed=0,
                                                  on_chunk=cb),
        path, fp)
    resumed = checkpoint.render_with_checkpoints(sc, spp=4, seed=0,
                                                 every=2, path=path)
    straight = volpath_soa.render_volpath_soa(sc, spp=4, seed=0)
    np.testing.assert_allclose(resumed, straight, atol=1e-6)


def test_stale_checkpoint_rejected(tmp_path):
    """A checkpoint from a different scene/seed/spp must be discarded."""
    sc = presets.cornell_box(width=8, height=8, spp=4, max_depth=3)
    path = str(tmp_path / "ck.npz")
    # Poisoned accumulator under a wrong fingerprint.
    checkpoint.save_checkpoint(
        path, np.full((3, 64), 1e9), 2, fingerprint="deadbeef")
    with pytest.warns(UserWarning, match="fingerprint mismatch"):
        out = checkpoint.render_with_checkpoints(sc, spp=4, seed=0,
                                                 every=2, path=path)
    straight = R.render(sc, spp=4, seed=0)
    np.testing.assert_allclose(out, straight, atol=1e-6)


def test_wrong_shape_checkpoint_rejected(tmp_path):
    sc = presets.cornell_box(width=8, height=8, spp=4, max_depth=3)
    path = str(tmp_path / "ck.npz")
    fp = checkpoint._fingerprint(sc, 4, 0)
    checkpoint.save_checkpoint(path, np.zeros((3, 16)), 2, fingerprint=fp)
    with pytest.warns(UserWarning, match="shape"):
        acc, done = checkpoint.load_checkpoint(path, fp, (3, 64))
    assert acc is None and done == 0


def test_aux_integrator_rejected(tmp_path):
    sc = presets.cornell_box(width=8, height=8, integrator="depth")
    with pytest.raises(ValueError, match="single-pass"):
        checkpoint.render_with_checkpoints(sc, path=str(tmp_path / "c.npz"))


def test_fingerprint_detects_single_element_edit():
    """A few changed floats inside a large device buffer must perturb
    the digest (the old strided byte sampling missed localized edits to
    multi-MB buffers with high probability — round-3 advisor finding)."""
    import jax

    sc = presets.cornell_box(width=8, height=8, spp=2, max_depth=3)
    fp0 = checkpoint._fingerprint(sc, 4, 0)
    # Find the largest float leaf and flip one element in the middle.
    leaves, treedef = jax.tree_util.tree_flatten(sc.device)
    sizes = [np.asarray(l).nbytes for l in leaves]
    big = int(np.argmax(sizes))
    a = np.array(np.asarray(leaves[big]))
    flat = a.reshape(-1)
    flat[flat.shape[0] // 2] = flat[flat.shape[0] // 2] + 1.0
    leaves2 = list(leaves)
    leaves2[big] = jax.numpy.asarray(a)
    sc2 = sc._replace(
        device=jax.tree_util.tree_unflatten(treedef, leaves2))
    fp1 = checkpoint._fingerprint(sc2, 4, 0)
    assert fp0 != fp1
