"""Torch-checkpoint interop: load reference-format .pth weights and match outputs.

Builds the reference's CILRS (model/autonomous_drive.py:361-399: torchvision
resnet34 trunk + speed encoder + 4 branches + aux head) in raw torch here (no
torchvision in the image), saves a checkpoint in the notebook's format, imports
it with cilrs_tpu.models.torch_import, and checks numerical output parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cilrs_tpu.models.cilrs import CILRS  # noqa: E402
from cilrs_tpu.models.torch_import import load_reference_checkpoint  # noqa: E402


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


def _make_layer(cin, cout, blocks, stride):
    layers = [BasicBlock(cin, cout, stride)]
    layers += [BasicBlock(cout, cout) for _ in range(blocks - 1)]
    return nn.Sequential(*layers)


class TorchCILRS(nn.Module):
    """Reference architecture rebuilt (same module names => same state dict keys)."""

    def __init__(self, num_commands=4):
        super().__init__()
        self.visual_encoder = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1),
            _make_layer(64, 64, 3, 1), _make_layer(64, 128, 4, 2),
            _make_layer(128, 256, 6, 2), _make_layer(256, 512, 3, 2),
            nn.AdaptiveAvgPool2d(1), nn.Flatten(),
        )
        self.speed_encoder = nn.Sequential(
            nn.Linear(1, 128), nn.ReLU(inplace=True), nn.Dropout(0.0),
            nn.Linear(128, 128), nn.ReLU(inplace=True),
        )
        self.control_branches = nn.ModuleList([
            nn.Sequential(
                nn.Linear(640, 256), nn.ReLU(inplace=True), nn.Dropout(0.0),
                nn.Linear(256, 256), nn.ReLU(inplace=True), nn.Dropout(0.0),
                nn.Linear(256, 3),
            ) for _ in range(num_commands)
        ])
        self.speed_predictor = nn.Sequential(
            nn.Linear(512, 256), nn.ReLU(inplace=True), nn.Dropout(0.0),
            nn.Linear(256, 256), nn.ReLU(inplace=True), nn.Linear(256, 1),
        )

    def forward(self, image, speed, command):
        v = self.visual_encoder(image)
        s = self.speed_encoder(speed.unsqueeze(1))
        combined = torch.cat([v, s], dim=1)
        pred_speed = self.speed_predictor(v).squeeze(1)
        outs = torch.stack([b(combined) for b in self.control_branches], dim=0)
        idx = command.unsqueeze(0).unsqueeze(2).expand(1, image.size(0), 3)
        return outs.gather(0, idx).squeeze(0), pred_speed


@pytest.mark.slow
def test_torch_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(0)
    tmodel = TorchCILRS().eval()
    # Perturb batchnorm running stats so the test catches stat mix-ups.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.6, 1.4)

    path = tmp_path / "checkpoint_best.pth"
    torch.save({"model_state_dict": tmodel.state_dict(), "epoch": 20,
                "val_loss": 0.0538}, path)

    variables = load_reference_checkpoint(str(path))

    rng = np.random.RandomState(1)
    img = rng.rand(2, 88, 200, 3).astype(np.float32)
    speed = rng.rand(2).astype(np.float32)
    cmd = np.array([0, 2], np.int32)

    with torch.no_grad():
        t_controls, t_pred = tmodel(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(speed), torch.from_numpy(cmd.astype(np.int64)),
        )

    model = CILRS(dropout=0.0, dtype=jnp.float32, speed_skip=False)
    f_controls, f_pred = model.apply(
        variables, jnp.asarray(img), jnp.asarray(speed), jnp.asarray(cmd),
        train=False,
    )

    np.testing.assert_allclose(
        np.asarray(f_controls), t_controls.numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(f_pred), t_pred.numpy(), atol=2e-3, rtol=1e-3
    )


def test_torchvision_trunk_graft():
    """init_trunk_from_torchvision grafts a plain torchvision resnet34
    state_dict onto the visual encoder and leaves the heads untouched."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cilrs_tpu.models import CILRS
    from cilrs_tpu.models.torch_import import init_trunk_from_torchvision

    model = CILRS(dropout=0.0, speed_skip=False)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 88, 200, 3)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
        train=False,
    )
    params, stats = variables["params"], variables["batch_stats"]

    # Synthesize a torchvision-style state dict with random values by
    # inverse-mapping our own trunk's shapes.
    rng = np.random.RandomState(0)
    sd = {}

    def add_conv(tname, kernel):
        shape = np.transpose(kernel, (3, 2, 0, 1)).shape
        sd[tname] = (rng.randn(*shape) * 0.05).astype(np.float32)

    def add_bn(tname, scope):
        n = scope["scale"].shape[0]
        sd[tname + ".weight"] = (1.0 + 0.1 * rng.randn(n)).astype(np.float32)
        sd[tname + ".bias"] = (0.1 * rng.randn(n)).astype(np.float32)
        sd[tname + ".running_mean"] = (0.1 * rng.randn(n)).astype(np.float32)
        sd[tname + ".running_var"] = np.abs(rng.randn(n) * 0.1 + 1.0).astype(np.float32)

    enc = params["visual_encoder"]
    add_conv("conv1.weight", enc["conv1"]["kernel"])
    add_bn("bn1", enc["bn1"])
    for stage, nblocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
        for b in range(nblocks):
            f = enc[f"layer{stage}_{b}"]
            add_conv(f"layer{stage}.{b}.conv1.weight", f["conv1"]["kernel"])
            add_bn(f"layer{stage}.{b}.bn1", f["bn1"])
            add_conv(f"layer{stage}.{b}.conv2.weight", f["conv2"]["kernel"])
            add_bn(f"layer{stage}.{b}.bn2", f["bn2"])
            if "downsample_conv" in f:
                add_conv(f"layer{stage}.{b}.downsample.0.weight",
                         f["downsample_conv"]["kernel"])
                add_bn(f"layer{stage}.{b}.downsample.1", f["downsample_bn"])
    sd["fc.weight"] = rng.randn(1000, 512).astype(np.float32)  # ignored

    p2, s2 = init_trunk_from_torchvision(params, stats, sd)

    # Trunk conv grafted with the OIHW -> HWIO transpose applied.
    got = np.asarray(p2["visual_encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    got_bn = np.asarray(s2["visual_encoder"]["layer3_2"]["bn2"]["mean"])
    np.testing.assert_allclose(got_bn, sd["layer3.2.bn2.running_mean"])
    # Heads untouched.
    np.testing.assert_allclose(
        np.asarray(p2["branches"]["w1"]), np.asarray(params["branches"]["w1"]))
    np.testing.assert_allclose(
        np.asarray(p2["speed_fc1"]["kernel"]), np.asarray(params["speed_fc1"]["kernel"]))
    # Grafted model still runs.
    out, _ = CILRS(dropout=0.0, speed_skip=False).apply(
        {"params": p2, "batch_stats": s2},
        jnp.zeros((2, 88, 200, 3)), jnp.zeros((2,)), jnp.zeros((2,), jnp.int32),
        train=False,
    ), None
    controls, pred_speed = out
    assert controls.shape == (2, 3) and np.isfinite(np.asarray(controls)).all()
