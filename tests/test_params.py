"""`.rsr` codec and parameter layout tests (SURVEY.md §8.1-8.2)."""

import numpy as np
import pytest

from rusty_sr_tpu import params as P

REF_RSR = "/root/reference/src/res/anime.rsr"


def test_num_params_factor3():
    assert P.num_params(3) == 130_459


def test_num_params_other_factors():
    # expand head scales as 3*f^2 in conv7/9/10 outputs and expand_bias
    base_no_expand = P.num_params(3) - (27 + 3 * 27 * 9 * 32)
    for f in (2, 4):
        e = 3 * f * f
        assert P.num_params(f) == base_no_expand + e + 3 * e * 9 * 32


@pytest.mark.parametrize("name", P.BUILTIN_WEIGHTS)
def test_decode_builtin_blobs(name):
    with open(f"/root/reference/src/res/{name}.rsr", "rb") as fh:
        data = fh.read()
    assert len(data) == 1_043_676
    flat = P.decode_rsr(data)
    assert flat.shape == (130_459,)
    assert np.isfinite(flat).all()


def test_codec_roundtrip():
    rng = np.random.default_rng(0)
    flat = rng.normal(size=1000).astype(np.float32)
    assert np.array_equal(P.decode_rsr(P.encode_rsr(flat)), flat)


def test_rsr_rejects_garbage():
    with pytest.raises(ValueError):
        P.decode_rsr(b"\x01")
    with pytest.raises(ValueError):
        P.decode_rsr(b"\x02\x00\x00\x00" + b"\x00" * 16)  # wrong total length


def test_flat_pytree_roundtrip():
    with open(REF_RSR, "rb") as fh:
        flat = P.decode_rsr(fh.read())
    tree = P.flat_to_pytree(flat, 3)
    assert tree["conv0"].shape == (5, 5, 3, 32)   # HWIO
    assert tree["conv7"].shape == (3, 3, 32, 27)
    assert tree["expand_bias"].shape == (27,)
    back = P.pytree_to_flat(tree, 3)
    assert np.array_equal(back, flat)


def test_vendored_weights_are_self_contained(monkeypatch):
    """Builtin weights resolve from package data (no reference mount),
    byte-identical to the reference blobs (src/main.rs:26-28), and the
    RUSTY_SR_TPU_WEIGHTS_DIR override wins when set."""
    import os
    d = P._builtin_dir()
    assert d.startswith(os.path.dirname(os.path.abspath(P.__file__)))
    for name in P.BUILTIN_WEIGHTS:
        with open(os.path.join(d, f"{name}.rsr"), "rb") as fh:
            vendored = fh.read()
        with open(f"/root/reference/src/res/{name}.rsr", "rb") as fh:
            assert vendored == fh.read()
    monkeypatch.setenv("RUSTY_SR_TPU_WEIGHTS_DIR", "/tmp/override_weights")
    assert P._builtin_dir() == "/tmp/override_weights"


def test_belu_init_visible_in_trained_weights():
    """`init_porque_no_los_dos` alternates p=1,0 by channel; trained values
    retain that parity structure (SURVEY.md §8.3)."""
    tree = P.load_builtin("anime")
    p = tree["f_belu"]
    assert p[0::2].mean() > p[1::2].mean()


def test_init_params_shapes_and_scheme():
    tree = P.init_params(0, 3)
    flat = P.pytree_to_flat(tree, 3)
    assert flat.size == 130_459
    p = tree["f_belu"]
    assert np.array_equal(p[0::2], np.ones_like(p[0::2]))
    assert np.array_equal(p[1::2], np.zeros_like(p[1::2]))
    assert np.all(tree["f_bias"] == 0.0)
    # MSRA std: conv0 gain 1.0 over fan_in 75; conv1 gain 0.1 over 800
    assert abs(tree["conv0"].std() - np.sqrt(2 / 75)) < 0.02
    assert abs(tree["conv1"].std() - 0.1 * np.sqrt(2 / 800)) < 0.002


def test_flat_to_pytree_leaves_own_their_memory():
    """Every leaf must be a COPY: pre-fix, 1-D leaves (biases, BeLU
    slopes) were live views into the caller's flat vector while conv
    leaves were transposed copies — mutating the flat buffer afterwards
    produced a silently mixed-state tree."""
    import numpy as np
    from rusty_sr_tpu.params import flat_to_pytree, pytree_to_flat, init_params
    flat = pytree_to_flat(init_params(0, 3), 3)
    tree = flat_to_pytree(flat, 3)
    before = {k: np.array(v) for k, v in tree.items()}
    assert not any(np.shares_memory(v, flat) for v in tree.values())
    flat[:] = -1.0
    for k, v in tree.items():
        np.testing.assert_array_equal(v, before[k], err_msg=k)
