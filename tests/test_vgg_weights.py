"""ImageNet-VGG19 weight pipeline proof (zero-egress environment).

Real ImageNet weights cannot be downloaded here (no network), so this
proves the entire pipeline around them is exact: a synthetic torchvision
state_dict with the REAL VGG19 shapes goes through
scripts/convert_vgg19_weights.py -> .npz -> models.vgg.load_imagenet_params
-> VGG19Features forward, and the features must match a torch conv/relu/
maxpool oracle of the same weights. With this green, dropping a genuinely
converted vgg19.npz at $VCGU_VGG19_WEIGHTS yields true ImageNet features
(reference semantics: upscaling/upscaler/model.py:101-117 feeds [-1,1]
images with no preprocessing into block5_conv4).
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from video_cycle_gan_upscaling_tpu.models import vgg


def _load_converter():
    spec = importlib.util.spec_from_file_location(
        "convert_vgg19_weights", "scripts/convert_vgg19_weights.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_state_dict(conv):
    rng = np.random.default_rng(0)
    state = {}
    c_in = 3
    for idx, name in conv.TORCH_TO_NAME.items():
        c_out = dict(x for x in vgg.VGG19_PLAN if x != "pool")[name]
        w = rng.normal(0, 0.05, (c_out, c_in, 3, 3)).astype(np.float32)
        b = rng.normal(0, 0.01, (c_out,)).astype(np.float32)
        state[f"features.{idx}.weight"] = torch.from_numpy(w)
        state[f"features.{idx}.bias"] = torch.from_numpy(b)
        c_in = c_out
    return state


def _torch_oracle(state, x_nhwc, conv, stop="block5_conv4"):
    """conv/relu/maxpool chain with the same plan, NCHW torch ops."""
    import torch.nn.functional as F

    y = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    idx_by_name = {v: k for k, v in conv.TORCH_TO_NAME.items()}
    for item in vgg.VGG19_PLAN:
        if item == "pool":
            y = F.max_pool2d(y, 2, 2)
            continue
        name, _ = item
        i = idx_by_name[name]
        y = F.conv2d(y, state[f"features.{i}.weight"],
                     state[f"features.{i}.bias"], padding=1)
        y = F.relu(y)
        if name == stop:
            break
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def test_convert_load_forward_golden(tmp_path):
    conv = _load_converter()
    state = _fake_state_dict(conv)
    src = tmp_path / "vgg19.pth"
    dst = tmp_path / "vgg19.npz"
    torch.save(state, src)
    conv.main(str(src), str(dst))

    params = vgg.load_imagenet_params(str(dst))
    extractor = vgg.VGGExtractor(params)
    assert extractor.source == "random"  # default tag; get_extractor sets it

    x = np.random.default_rng(1).uniform(-1, 1, (1, 32, 32, 3)
                                         ).astype(np.float32)
    feats = np.asarray(extractor(jnp.asarray(x)))
    ref = _torch_oracle(state, x, conv)
    assert feats.shape == ref.shape
    np.testing.assert_allclose(feats, ref, rtol=2e-3, atol=2e-3)


def test_get_extractor_imagenet_tag(tmp_path, monkeypatch):
    conv = _load_converter()
    state = _fake_state_dict(conv)
    src, dst = tmp_path / "w.pth", tmp_path / "w.npz"
    torch.save(state, src)
    conv.main(str(src), str(dst))
    monkeypatch.setenv("VCGU_VGG19_WEIGHTS", str(dst))
    ex = vgg.get_extractor()
    assert ex.source == "imagenet"
    y = ex(jnp.zeros((1, 32, 32, 3)))
    assert y.shape[-1] == 512


def test_manifest_matches_plan():
    """The committed manifest (assets/vgg19_imagenet_manifest.json) must
    agree with the in-code VGG19 plan: layer set, HWIO shapes chained
    correctly, and the total trunk parameter count (20,024,384 — the
    torchvision VGG19 features trunk up to block5_conv4)."""
    conv = _load_converter()
    man = conv.load_manifest()
    plan = [x for x in vgg.VGG19_PLAN if x != "pool"]
    assert set(man["layers"]) == {n for n, _ in plan}
    cin, total = 3, 0
    for name, ch in plan:
        assert man["layers"][name]["kernel"] == [3, 3, cin, ch], name
        assert man["layers"][name]["bias"] == [ch], name
        total += 3 * 3 * cin * ch + ch
        cin = ch
    assert man["total_params_trunk"] == total == 20024384
    assert set(conv.TORCH_TO_NAME.values()) == set(man["layers"])


def test_converter_rejects_wrong_shapes(tmp_path):
    """A source checkpoint whose layer shapes disagree with the manifest
    must fail conversion (not silently write a broken .npz)."""
    conv = _load_converter()
    state = _fake_state_dict(conv)
    state["features.0.weight"] = torch.zeros((65, 3, 3, 3))
    state["features.0.bias"] = torch.zeros((65,))
    src, dst = tmp_path / "w.pth", tmp_path / "w.npz"
    torch.save(state, src)
    with pytest.raises(ValueError):
        conv.main(str(src), str(dst))


def test_converted_npz_records_source_sha(tmp_path):
    conv = _load_converter()
    state = _fake_state_dict(conv)
    src, dst = tmp_path / "w.pth", tmp_path / "w.npz"
    torch.save(state, src)
    conv.main(str(src), str(dst))
    raw = np.load(dst)
    assert len(str(raw["_source_sha256"])) == 64


def test_load_rejects_wrong_shapes(tmp_path):
    bad = {f"{n}/kernel": np.zeros((3, 3, 3, 7), np.float32)
           for n, _ in [x for x in vgg.VGG19_PLAN if x != "pool"]}
    bad.update({f"{n}/bias": np.zeros((7,), np.float32)
                for n, _ in [x for x in vgg.VGG19_PLAN if x != "pool"]})
    p = tmp_path / "bad.npz"
    np.savez(p, **bad)
    with pytest.raises(ValueError):
        vgg.load_imagenet_params(str(p))


def test_stem_block_equivalence_and_grad():
    """stem_block evaluates block1_conv1 as an S-blocked phase conv —
    same params, same map (within fp tolerance), and differentiable (it
    sits inside training perceptual-loss graphs)."""
    params = vgg.init_random_params(seed=3, output_layer="block1_conv2")
    x = np.random.default_rng(2).uniform(-1, 1, (2, 8, 12, 3)
                                         ).astype(np.float32)
    plain = vgg.VGGExtractor(params, output_layer="block1_conv2")
    blocked = vgg.VGGExtractor(params, output_layer="block1_conv2",
                               stem_block=2)
    y0 = np.asarray(plain(jnp.asarray(x)))
    y1 = np.asarray(blocked(jnp.asarray(x)))
    np.testing.assert_allclose(y0, y1, atol=2e-5)

    g = jax.grad(lambda z: jnp.sum(blocked(z) ** 2))(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()
    g0 = jax.grad(lambda z: jnp.sum(plain(z) ** 2))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0), atol=2e-4)


def test_stem_block_falls_back_on_odd_dims():
    params = vgg.init_random_params(seed=3, output_layer="block1_conv1")
    ex = vgg.VGGExtractor(params, output_layer="block1_conv1", stem_block=4)
    y = ex(jnp.zeros((1, 7, 9, 3)))  # 7x9: no block divides -> plain conv
    assert y.shape == (1, 7, 9, 64)
