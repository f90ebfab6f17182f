"""Flax ResNet x-vector model vs the reference PyTorch model (used as an
architecture oracle with random weights — the snapshot ships no NN
checkpoints, SURVEY.md C14)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from vbx_tpu.models.resnet import (BasicBlock, Bottleneck, ResNetXVector,
                                   convert_torch_state_dict, fold_batchnorm,
                                   resnet34, resnet101)

from .util import import_reference

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(f"{REF}/VBx"),
                               reason="reference not mounted")
torch = pytest.importorskip("torch")


def _ref_resnet():
    return import_reference("models.resnet")


def _compare(torch_model, flax_model, num_blocks, feat, tol):
    torch_model.eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params, stats = convert_torch_state_dict(sd, num_blocks=num_blocks)
    variables = {**params, **stats}

    with torch.no_grad():
        theirs = torch_model(torch.tensor(feat.copy(), dtype=torch.float32)
                             ).numpy()
    ours = np.asarray(flax_model.apply(variables, jnp.asarray(feat)))
    assert ours.shape == theirs.shape
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=tol * scale)
    return variables, ours


@needs_ref
def test_resnet101_matches_torch_reference():
    ref = _ref_resnet()
    torch.manual_seed(0)
    tm = ref.ResNet101(feat_dim=64, embed_dim=256)
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((2, 64, 50)).astype(np.float32)
    variables, ours = _compare(tm, resnet101(64, 256), (3, 4, 23, 3), feat,
                               tol=2e-4)

    # BN folding must not change the output
    folded = fold_batchnorm(variables)
    ours_folded = np.asarray(resnet101(64, 256).apply(
        folded, jnp.asarray(feat)))
    np.testing.assert_allclose(ours_folded, ours,
                               atol=1e-4 * np.abs(ours).max())


@needs_ref
def test_resnet34_matches_torch_reference():
    ref = _ref_resnet()
    torch.manual_seed(1)
    tm = ref.ResNet(ref.BasicBlock, [3, 4, 6, 3], feat_dim=64, embed_dim=256)
    rng = np.random.default_rng(1)
    feat = rng.standard_normal((2, 64, 144)).astype(np.float32)
    _compare(tm, resnet34(64, 256), (3, 4, 6, 3), feat, tol=2e-4)


@needs_ref
@pytest.mark.parametrize("block_name", ["basic", "bottleneck"])
def test_masked_variable_length_equals_true_length(block_name):
    """A zero-padded batch entry with `lengths` must reproduce the torch
    model's output at the true length exactly (the tail-window batching
    path, predict.py:195-210)."""
    ref = _ref_resnet()
    torch.manual_seed(2)
    if block_name == "basic":
        tm = ref.ResNet(ref.BasicBlock, [2, 2, 2, 2], feat_dim=64,
                        embed_dim=64)
        fm = ResNetXVector(block=BasicBlock, num_blocks=(2, 2, 2, 2),
                           feat_dim=64, embed_dim=64)
        nb = (2, 2, 2, 2)
    else:
        tm = ref.ResNet(ref.Bottleneck, [1, 1, 1, 1], feat_dim=64,
                        embed_dim=64)
        fm = ResNetXVector(block=Bottleneck, num_blocks=(1, 1, 1, 1),
                           feat_dim=64, embed_dim=64)
        nb = (1, 1, 1, 1)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_torch_state_dict(sd, num_blocks=nb)
    variables = {**params, **stats}

    rng = np.random.default_rng(3)
    lengths = [10, 77, 144]
    T_pad = 144
    feat = np.zeros((len(lengths), 64, T_pad), np.float32)
    refs = []
    for i, L in enumerate(lengths):
        f = rng.standard_normal((64, L)).astype(np.float32)
        feat[i, :, :L] = f
        with torch.no_grad():
            refs.append(tm(torch.tensor(f[None].copy())).numpy()[0])
    theirs = np.stack(refs)
    ours = np.asarray(fm.apply(variables, jnp.asarray(feat),
                               lengths=jnp.asarray(lengths)))
    np.testing.assert_allclose(ours, theirs,
                               atol=2e-4 * np.abs(theirs).max())


def test_resnet_output_shape_and_determinism():
    model = resnet34(64, 256)
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.standard_normal((3, 64, 144)), jnp.float32)
    import jax
    variables = model.init(jax.random.key(0), feat)
    a = model.apply(variables, feat)
    b = model.apply(variables, feat)
    assert a.shape == (3, 256)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_ref
def test_selayer_matches_torch_reference():
    """Our NHWC SELayer vs the reference torch SELayer (resnet.py:74-89)
    with imported weights."""
    from vbx_tpu.models.resnet import SELayer

    ref = _ref_resnet()
    torch.manual_seed(1)
    C, r = 32, 8
    tse = ref.SELayer(C, reduction=r).eval()
    rng = np.random.default_rng(1)
    x_nchw = rng.standard_normal((3, C, 5, 7)).astype(np.float32)
    with torch.no_grad():
        theirs = tse(torch.tensor(x_nchw)).numpy()

    fse = SELayer(C, reduction=r)
    variables = {"params": {
        "fc1": {"kernel": tse.fc[0].weight.detach().numpy().T},
        "fc2": {"kernel": tse.fc[2].weight.detach().numpy().T}}}
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    ours = np.asarray(fse.apply(variables, jnp.asarray(x_nhwc)))
    np.testing.assert_allclose(
        np.transpose(ours, (0, 3, 1, 2)), theirs, atol=1e-6)


@needs_ref
def test_se_resnet_import_and_masking():
    """SE-wired blocks: the converter maps torch `se.fc.{0,2}` keys, and a
    padded batch entry embeds exactly as its unpadded run (the SE squeeze
    must average valid frames only)."""
    from vbx_tpu.models.resnet import se_resnet34

    ref = _ref_resnet()
    torch.manual_seed(2)
    fm = ResNetXVector(block=BasicBlock, num_blocks=(1, 1, 1, 1),
                       feat_dim=16, embed_dim=24, se_reduction=4)
    rng = np.random.default_rng(2)
    feat = rng.standard_normal((1, 16, 40)).astype(np.float32)
    import jax

    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(feat))
    # every block got an SE gate
    for blk, p in variables["params"].items():
        if blk.startswith("layer"):
            assert "se" in p, f"{blk} missing SE params"

    # converter maps torch-style `se.fc.{0,2}` keys onto the flax tree:
    # take a real reference state dict and inject SELayer weights per block
    tm = ref.ResNet(ref.BasicBlock, [1, 1, 1, 1], feat_dim=16, embed_dim=24)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    for li in range(1, 5):
        tse = ref.SELayer(32 * 2 ** (li - 1), reduction=4)  # planes from m_channels=32
        for i in (0, 2):
            sd[f"layer{li}.0.se.fc.{i}.weight"] = \
                tse.fc[i].weight.detach().numpy()
    params, stats = convert_torch_state_dict(sd, num_blocks=(1, 1, 1, 1))
    conv_vars = {**params, **stats}
    np.testing.assert_array_equal(
        conv_vars["params"]["layer2_0"]["se"]["fc1"]["kernel"],
        sd["layer2.0.se.fc.0.weight"].T)
    # the converted tree drives the SE model end to end
    e = np.asarray(fm.apply(conv_vars, jnp.asarray(feat)))
    assert e.shape == (1, 24) and np.all(np.isfinite(e))

    # padded == true length through the SE squeeze
    T_true = 40
    padded = np.zeros((1, 16, 64), np.float32)
    padded[:, :, :T_true] = feat
    e_true = np.asarray(fm.apply(variables, jnp.asarray(feat),
                                 lengths=jnp.asarray([T_true])))
    e_pad = np.asarray(fm.apply(variables, jnp.asarray(padded),
                                lengths=jnp.asarray([T_true])))
    np.testing.assert_allclose(e_pad, e_true, atol=1e-5 * np.abs(e_true).max())

    big = se_resnet34(feat_dim=64, embed_dim=256)
    assert big.se_reduction == 16


@needs_ref
def test_convert_rejects_depth_mismatch():
    """The conversion must refuse a checkpoint whose depth disagrees with
    num_blocks in EITHER direction (silently dropping layer3 blocks 3..22
    of a ResNet101 checkpoint would only surface as bad embeddings)."""
    ref = _ref_resnet()
    torch.manual_seed(5)
    tm = ref.ResNet(ref.Bottleneck, [2, 2, 2, 2], m_channels=8,
                    feat_dim=32, embed_dim=64)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    with pytest.raises(ValueError, match="not consumed"):
        convert_torch_state_dict(sd, num_blocks=(1, 1, 1, 1))
    with pytest.raises(ValueError, match="shallower"):
        convert_torch_state_dict(sd, num_blocks=(3, 3, 3, 3))


@needs_ref
def test_full_depth_conversion_covers_all_layers():
    """All 101 layers of the real architecture map: 33 blocks x 3 convs +
    stem + embedding, with every torch tensor consumed (conversion raises
    otherwise) and every flax block subtree populated."""
    ref = _ref_resnet()
    torch.manual_seed(6)
    tm = ref.ResNet101(feat_dim=64, embed_dim=256)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_torch_state_dict(sd, num_blocks=(3, 4, 23, 3))
    p = params["params"]
    n_convs = sum(1 for blk in p.values() if isinstance(blk, dict)
                  for k in blk if k.startswith("conv"))
    assert n_convs == 3 * (3 + 4 + 23 + 3)   # 99 block convs
    assert "conv1" in p and "embedding" in p   # + stem + head = 101 layers
    for li, n in enumerate((3, 4, 23, 3), start=1):
        for bi in range(n):
            assert p[f"layer{li}_{bi}"], f"layer{li}_{bi} empty"
            assert stats["batch_stats"][f"layer{li}_{bi}"]


@needs_ref
def test_convert_tolerates_training_time_extras():
    """Released checkpoints can carry non-extractor tensors (training
    heads); the reference loads them strict=False (predict.py:124). The
    conversion must warn and proceed — only EXTRACTOR-module leftovers
    (depth mismatch) abort."""
    ref = _ref_resnet()
    torch.manual_seed(7)
    tm = ref.ResNet(ref.Bottleneck, [1, 1, 1, 1], m_channels=8,
                    feat_dim=32, embed_dim=64)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    sd["cls_head.weight"] = np.zeros((4, 64), np.float32)
    sd["cls_head.bias"] = np.zeros(4, np.float32)
    with pytest.warns(UserWarning, match="non-extractor"):
        params, stats = convert_torch_state_dict(sd, num_blocks=(1, 1, 1, 1))
    assert "embedding" in params["params"]
