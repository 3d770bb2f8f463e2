"""Weight-converter tests: MXNet .params binary parsing (synthetic file in
the NDArray-list V2 format) and torch->flax ResNet mapping (synthetic
state_dict with torchvision naming; torchvision itself is not installed)."""

import struct
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tools")

from convert_params import convert_torch_resnet, load_mxnet_params  # noqa: E402


def _write_mxnet_params(path, tensors: dict):
    NDLIST_MAGIC = 0x112
    V2 = 0xF993FAC9
    buf = bytearray()
    buf += struct.pack("<QQ", NDLIST_MAGIC, 0)
    buf += struct.pack("<Q", len(tensors))
    for arr in tensors.values():
        arr = np.asarray(arr, np.float32)
        buf += struct.pack("<I", V2)
        buf += struct.pack("<i", 0)  # dense storage
        buf += struct.pack("<i", arr.ndim)
        buf += struct.pack(f"<{arr.ndim}q", *arr.shape)
        buf += struct.pack("<iii", 1, 0, 0)  # cpu, dev 0, float32
        buf += arr.tobytes()
    buf += struct.pack("<Q", len(tensors))
    for name in tensors:
        b = name.encode()
        buf += struct.pack("<Q", len(b)) + b
    with open(path, "wb") as f:
        f.write(bytes(buf))


def test_mxnet_params_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "arg:conv1_weight": rng.standard_normal((64, 3, 7, 7)).astype(np.float32),
        "arg:fc_bias": rng.standard_normal((19,)).astype(np.float32),
        "aux:bn_conv1_moving_mean": rng.standard_normal((64,)).astype(np.float32),
    }
    p = tmp_path / "test-0000.params"
    _write_mxnet_params(str(p), tensors)
    arg, aux = load_mxnet_params(str(p))
    np.testing.assert_array_equal(arg["conv1_weight"], tensors["arg:conv1_weight"])
    np.testing.assert_array_equal(arg["fc_bias"], tensors["arg:fc_bias"])
    np.testing.assert_array_equal(
        aux["bn_conv1_moving_mean"], tensors["aux:bn_conv1_moving_mean"]
    )


def _fake_torch_resnet18_sd(rng):
    """torchvision resnet18 key naming with correctly-shaped arrays."""
    sd = {
        "conv1.weight": rng.standard_normal((64, 3, 7, 7)).astype(np.float32),
        "bn1.weight": np.ones(64, np.float32),
        "bn1.bias": np.zeros(64, np.float32),
        "bn1.running_mean": np.zeros(64, np.float32),
        "bn1.running_var": np.ones(64, np.float32),
    }
    widths = [64, 128, 256, 512]
    in_ch = 64
    for li, w in enumerate(widths, start=1):
        for bi in range(2):
            t = f"layer{li}.{bi}"
            c_in = in_ch if bi == 0 else w
            sd[f"{t}.conv1.weight"] = rng.standard_normal((w, c_in, 3, 3)).astype(np.float32)
            sd[f"{t}.conv2.weight"] = rng.standard_normal((w, w, 3, 3)).astype(np.float32)
            for bn in ("bn1", "bn2"):
                sd[f"{t}.{bn}.weight"] = np.ones(w, np.float32)
                sd[f"{t}.{bn}.bias"] = np.zeros(w, np.float32)
                sd[f"{t}.{bn}.running_mean"] = np.zeros(w, np.float32)
                sd[f"{t}.{bn}.running_var"] = np.ones(w, np.float32)
            if bi == 0 and c_in != w:
                sd[f"{t}.downsample.0.weight"] = rng.standard_normal((w, c_in, 1, 1)).astype(np.float32)
                sd[f"{t}.downsample.1.weight"] = np.ones(w, np.float32)
                sd[f"{t}.downsample.1.bias"] = np.zeros(w, np.float32)
                sd[f"{t}.downsample.1.running_mean"] = np.zeros(w, np.float32)
                sd[f"{t}.downsample.1.running_var"] = np.ones(w, np.float32)
        in_ch = w
    return sd


def test_torch_resnet18_conversion_loads_into_model():
    from accel_tpu.models.resnet import DilatedResNet

    rng = np.random.default_rng(1)
    sd = _fake_torch_resnet18_sd(rng)
    params, stats = convert_torch_resnet(sd, 18)

    m = DilatedResNet(depth=18, output_stride=16, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    init_vars = m.init(jax.random.PRNGKey(0), x)

    # every converted leaf path must exist in the init tree with same shape
    init_flat = dict(jax.tree_util.tree_flatten_with_path(init_vars["params"])[0])
    conv_flat = dict(jax.tree_util.tree_flatten_with_path({k: v for k, v in params.items()})[0])
    init_keys = {jax.tree_util.keystr(k): v.shape for k, v in init_flat.items()}
    for k, v in conv_flat.items():
        ks = jax.tree_util.keystr(k)
        assert ks in init_keys, f"converted key {ks} missing from model tree"
        assert init_keys[ks] == np.asarray(v).shape, ks

    # the model runs with the converted weights
    merged = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    out = m.apply(
        {"params": merged, "batch_stats": jax.tree.map(jnp.asarray, stats)}, x
    )
    assert out.shape == (1, 4, 4, 512)
    assert np.isfinite(np.asarray(out)).all()
