"""PyTorch→JAX weight importer: numerical equivalence against a torch replica."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eyediseasesegmentation_tpu.models.encoders import ResNetEncoder  # noqa: E402
from eyediseasesegmentation_tpu.utils import torch_import as TI  # noqa: E402


class TorchSEBottleneck(tnn.Module):
    """senet-style SE bottleneck (test oracle, senet naming via state_dict keys)."""

    def __init__(self, cin, width, stride=1, reduction=16):
        super().__init__()
        out = width * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.se_module = tnn.Module()
        self.se_module.fc1 = tnn.Conv2d(out, out // reduction, 1)
        self.se_module.fc2 = tnn.Conv2d(out // reduction, out, 1)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(cin, out, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(out))

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        s = torch.nn.functional.adaptive_avg_pool2d(y, 1)
        s = torch.relu(self.se_module.fc1(s))
        s = torch.sigmoid(self.se_module.fc2(s))
        y = y * s
        return torch.relu(y + self.downsample(x))


class TorchStem(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.pool = tnn.MaxPool2d(3, stride=2, padding=1)

    def forward(self, x):
        return self.pool(torch.relu(self.bn1(self.conv1(x))))


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    stem = TorchStem().eval()
    block = TorchSEBottleneck(64, 64).eval()
    # randomize BN stats so eval mode is non-trivial
    for m in list(stem.modules()) + list(block.modules()):
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    return stem, block


def _state_dict(stem, block):
    sd = {}
    for k, v in stem.state_dict().items():
        sd[f"layer0.{k}"] = v
    for k, v in block.state_dict().items():
        sd[f"layer1.0.{k}"] = v
    return sd


def test_conv_and_dense_layout():
    w = torch.arange(2 * 3 * 3 * 3, dtype=torch.float32).reshape(2, 3, 3, 3)
    hwio = TI.conv_kernel(w)
    assert hwio.shape == (3, 3, 3, 2)
    lin = torch.arange(6, dtype=torch.float32).reshape(2, 3)
    assert TI.dense_kernel(lin).shape == (3, 2)


def test_imported_encoder_matches_torch(torch_net):
    stem, block = torch_net
    enc = ResNetEncoder(stage_sizes=(1,), block="bottleneck", use_se=True,
                        num_stages=1, dtype=jnp.float32)
    x_np = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def unfreeze(d):
        return {k: unfreeze(v) for k, v in d.items()} if hasattr(d, "items") else d

    params, bs = unfreeze(params), unfreeze(bs)
    report = TI.import_se_resnet50(_state_dict(stem, block), params, bs,
                                   prefix=(), num_stages=1)
    assert not report["missing_in_jax"], report["missing_in_jax"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert len(report["loaded"]) > 20

    feats = enc.apply({"params": params, "batch_stats": bs},
                      jnp.asarray(x_np), train=False)
    got = np.asarray(feats[-1])  # stage-1 output

    with torch.no_grad():
        t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        want = block(stem(t)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_load_torch_checkpoint_unwrap(tmp_path, torch_net):
    stem, block = torch_net
    sd = _state_dict(stem, block)
    wrapped = {"model_state_dict": {f"module.{k}": v for k, v in sd.items()}}
    p = tmp_path / "ckpt.pth"
    torch.save(wrapped, p)
    loaded = TI.load_torch_checkpoint(p)
    assert set(loaded) == set(sd)
