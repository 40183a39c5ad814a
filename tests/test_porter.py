"""Checkpoint porter: wrapper formats, layout rules, weight-norm folding."""

import numpy as np
import pytest
import torch

from ntire2022_esr_tpu import porter


def _save(tmp_path, obj, name="ckpt.pth"):
    p = str(tmp_path / name)
    torch.save(obj, p)
    return p


def test_plain_state_dict(tmp_path, rng):
    sd = {"conv.weight": torch.randn(8, 3, 3, 3), "conv.bias": torch.randn(8)}
    path = _save(tmp_path, sd)
    out = porter.read_torch_checkpoint(path)
    assert list(out) == ["conv.weight", "conv.bias"]


@pytest.mark.parametrize("wrapper", ["params", "net", "model_state_dict"])
def test_wrapped_state_dicts(tmp_path, wrapper):
    sd = {"a.weight": torch.ones(4, 2, 3, 3)}
    path = _save(tmp_path, {wrapper: sd, "epoch": 12})
    out = porter.read_torch_checkpoint(path)
    assert "a.weight" in out


def test_module_prefix_stripped(tmp_path):
    sd = {"module.fea.weight": torch.ones(4, 2, 3, 3), "module.fea.bias": torch.ones(4)}
    path = _save(tmp_path, sd)
    out = porter.read_torch_checkpoint(path)
    assert set(out) == {"fea.weight", "fea.bias"}


def test_conv_layout_rule(rng):
    w = rng.randn(8, 3, 5, 7).astype(np.float32)  # OIHW
    flat = porter.port_state_dict({"c.weight": w})
    assert flat["c.weight"].shape == (5, 7, 3, 8)  # HWIO
    np.testing.assert_array_equal(flat["c.weight"], w.transpose(2, 3, 1, 0))


def test_linear_rule_only_matching(rng):
    w2 = rng.randn(6, 4).astype(np.float32)
    flat = porter.port_state_dict({"fc.weight": w2, "table": w2.copy()},
                                  linear_keys=(r"fc\.",))
    assert flat["fc.weight"].shape == (4, 6)     # transposed
    assert flat["table"].shape == (6, 4)          # raw (doesn't end in .weight pattern match)


def test_weight_norm_folding(rng):
    v = rng.randn(8, 4, 3, 3).astype(np.float32)
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(1, 2, 3), keepdims=True))
    g = rng.rand(8, 1, 1, 1).astype(np.float32) + 0.5
    sd = {"c.weight_g": g, "c.weight_v": v}
    flat = porter.port_state_dict(sd)
    expected = (g.astype(np.float64) * v / norm).astype(np.float32).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(flat["c.weight"], expected, rtol=1e-6)
    assert "c.weight_g" not in flat and "c.weight_v" not in flat


def test_weight_norm_matches_torch(rng):
    conv = torch.nn.utils.weight_norm(torch.nn.Conv2d(4, 8, 3))
    sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    flat = porter.port_state_dict(sd)
    with torch.no_grad():
        norm = conv.weight_v.pow(2).sum(dim=(1, 2, 3), keepdim=True).sqrt()
        ref = conv.weight_v * (conv.weight_g / norm)
    np.testing.assert_allclose(
        flat["weight"], ref.numpy().transpose(2, 3, 1, 0), rtol=1e-5, atol=1e-6)


def test_buffers_dropped():
    sd = {
        "b.attn_mask": np.zeros((4, 9, 9), np.float32),
        "b.relative_position_index": np.zeros((9, 9), np.int64),
        "bn.num_batches_tracked": np.int64(7),
        "bn.running_mean": np.zeros(4, np.float32),
    }
    flat = porter.port_state_dict(sd)
    assert set(flat) == {"bn.running_mean"}


def test_nest_flatten_roundtrip(rng):
    flat = {"a.b.weight": rng.rand(2, 2).astype(np.float32), "c": rng.rand(3).astype(np.float32)}
    tree = porter.nest(flat)
    assert tree["a"]["b"]["weight"].shape == (2, 2)
    from ntire2022_esr_tpu.porter.convert import flatten

    back = flatten(tree)
    assert set(back) == set(flat)


def test_npz_cache_roundtrip(tmp_path, rng):
    tree = {"x": {"weight": rng.rand(3, 3, 2, 4).astype(np.float32)}, "y": rng.rand(5).astype(np.float32)}
    path = str(tmp_path / "w.npz")
    porter.save_params(path, tree)
    back = porter.load_params(path)
    np.testing.assert_array_equal(back["x"]["weight"], tree["x"]["weight"])
    np.testing.assert_array_equal(back["y"], tree["y"])


# ---------------------------------------------------------------------------
# Analytic reparam fold (porter/reparam.py vs team29_clrfdn.py:221-244)
# ---------------------------------------------------------------------------

def _linearblock_case(tag):
    import os

    z = np.load(os.path.join(os.path.dirname(__file__), "goldens", "blocks.npz"))
    prefix = f"linearblock_{tag}/"
    c = {k[len(prefix):]: z[k] for k in z.files if k.startswith(prefix)}
    return c


@pytest.mark.parametrize("tag,with_idt", [("linear", False), ("idt", True),
                                          ("prelu", False)])
def test_fold_linear_block_matches_reference(tag, with_idt):
    c = _linearblock_case(tag)
    rk, rb = porter.fold_linear_block(
        c["p/conv3x3.weight"], c["p/conv3x3.bias"],
        c["p/conv1x1.weight"], c["p/conv1x1.bias"], with_idt=with_idt)
    np.testing.assert_allclose(rk, c["p/rep/weight"], atol=1e-6, rtol=0)
    np.testing.assert_allclose(rb, c["p/rep/bias"], atol=1e-6, rtol=0)


@pytest.mark.parametrize("tag,with_idt", [("linear", False), ("idt", True),
                                          ("prelu", False)])
def test_folded_conv_matches_torch_forward(tag, with_idt):
    from ntire2022_esr_tpu import ops

    c = _linearblock_case(tag)
    tree = porter.nest({k[2:]: v for k, v in c.items() if k.startswith("p/")
                        and not k.startswith("p/rep/")})
    folded = porter.fold_linear_block_tree(tree, with_idt=with_idt)
    x = np.transpose(c["x"], (0, 2, 3, 1))
    y = ops.conv(folded, x)
    if tag == "prelu":
        y = ops.prelu(y, folded["act"]["weight"])
    np.testing.assert_allclose(np.asarray(y), np.transpose(c["y"], (0, 2, 3, 1)),
                               atol=2e-6, rtol=0)


def test_fold_linear_block_validation():
    w3 = np.zeros((3, 3, 4, 8), np.float32)
    w1 = np.zeros((1, 1, 8, 6), np.float32)
    with pytest.raises(ValueError, match="identity fold"):
        porter.fold_linear_block(w3, None, w1, None, with_idt=True)
    with pytest.raises(ValueError, match="mid-channel"):
        porter.fold_linear_block(w3, None, np.zeros((1, 1, 5, 6), np.float32), None)
    with pytest.raises(ValueError, match="3x3 then 1x1"):
        porter.fold_linear_block(w1, None, w1, None)
