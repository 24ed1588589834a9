"""Whole-model forward parity against the ACTUAL reference networks.

Instantiates the reference torch ``Associator`` (src/models/associator.py:
156-268, incl. its PositionalEncoding at :315-327) and the reference DETR
``Transformer`` (src/models/transformer.py:16-129) with random weights, ports
the state dicts through ``odam_tpu.models.porting``, and asserts our Flax
modules reproduce the reference outputs end to end.  This is the test the
op-level checks in test_porting.py cannot replace: a silent composition-order
or PE mismatch would survive every module test and only show up as degraded
F1 on real data.

Reference modules are imported from /root/reference (read-only) with the same
lightweight dependency stubs used by test_reference_parity.py.  The reference
hardcodes "cuda" inside its PositionalEncoding (associator.py:320-323); we
patch ``torch.Tensor.to`` to remap cuda->cpu so the real reference code runs
unmodified on host.
"""
import os
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_models():
    """Import reference model modules with dependency stubs installed."""
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15"
    tv_models = types.ModuleType("torchvision.models")
    tv_models_utils = types.ModuleType("torchvision.models._utils")
    tv_models_utils.IntermediateLayerGetter = object
    tv_models._utils = tv_models_utils
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    tv_ops.boxes = tv_boxes
    tv.ops = tv_ops
    tv.models = tv_models
    for name, mod in [
        ("torchvision", tv),
        ("torchvision.models", tv_models),
        ("torchvision.models._utils", tv_models_utils),
        ("torchvision.ops", tv_ops),
        ("torchvision.ops.boxes", tv_boxes),
    ]:
        sys.modules.setdefault(name, mod)

    sys.path.insert(0, REF)
    try:
        import importlib

        yield {
            "associator": importlib.import_module("src.models.associator"),
            "transformer": importlib.import_module("src.models.transformer"),
            "detr": importlib.import_module("src.models.detr"),
        }
    finally:
        sys.path.remove(REF)


@pytest.fixture()
def cuda_as_cpu(monkeypatch):
    """Remap .to("cuda") -> .to("cpu") so reference modules run on host."""
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        args = tuple(
            "cpu" if (isinstance(a, (str, torch.device)) and str(a) == "cuda") else a
            for a in args
        )
        if str(kwargs.get("device", "")) == "cuda":
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to)


def test_associator_whole_model_parity(ref_models, cuda_as_cpu, rng):
    """Reference Associator.forward == our Associator under ported weights.

    Full production config (configs/detr_scan_net.yaml:27-33): descriptor 256,
    encoder [78,256,256], 8 GNN layers, 2 fuser layers, 100 Sinkhorn iters.
    Batch 1, as the pipeline runs it (processor.py:333-337), so the
    reference's _reshape_tracks padding is a no-op and the comparison isolates
    the network itself.  Detections padded to 30 with -1 rows that participate
    in attention — exactly the reference collater's batch (processor.py:58).
    """
    import jax.numpy as jnp

    from odam_tpu.models import porting
    from odam_tpu.models.associator import Associator, AssociatorConfig

    ref_mod = ref_models["associator"]
    torch.manual_seed(0)
    config = {
        "descriptor_dim": 256,
        "weights": "indoor",
        "keypoint_encoder": [78, 256, 256],
        "GNN_layers": ["self", "cross"] * 4,
        "self_GNN_layers": ["self", "self"],
        "match_threshold": 0.2,
        "sinkhorn_iterations": 100,
    }
    ref = ref_mod.Associator(config).eval()

    T, W, NV, MAXD = 5, 100, 7, 30
    # Track tensor in the reference layout [T, 79, W]: row 0 = time index,
    # oldest-first, padded (future) steps all -1 (processor.py:133-178).
    tracks_np = np.full((T, 79, W), -1.0, dtype=np.float32)
    for t in range(T):
        n_steps = int(rng.integers(3, W))
        tracks_np[t, 0, :n_steps] = np.sort(rng.integers(0, 120, size=n_steps))
        tracks_np[t, 1:, :n_steps] = rng.normal(size=(78, n_steps)) * 0.5
    dets_np = np.full((1, 79, MAXD), -1.0, dtype=np.float32)
    dets_np[0, 0, :NV] = 120.0
    dets_np[0, 1:, :NV] = rng.normal(size=(78, NV)) * 0.5

    in_data = {
        "detections": torch.from_numpy(dets_np),
        "tracks": torch.from_numpy(tracks_np),
        "valid_list": [(T, NV)],
    }
    with torch.no_grad():
        ref_out = ref(in_data, 0.1, eval_only=True, device="cpu")
    ref_Z = ref_out["pred"][0][0].numpy()        # [T+1, NV+1]
    ref_matches = np.asarray(ref_out["matches"][0])  # [NV]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = porting.convert_associator(sd, d_model=256, num_heads=4,
                                        n_gnn=8, n_fuser=2)

    ours = Associator(AssociatorConfig())
    out = ours.apply(
        params,
        jnp.asarray(tracks_np.transpose(0, 2, 1))[None],   # [1, T, W, 79]
        jnp.ones((1, T), bool),
        jnp.asarray(dets_np.transpose(0, 2, 1)),           # [1, MAXD, 79]
        jnp.arange(MAXD)[None] < NV,
        0.1,
    )
    Z = np.asarray(out.log_assignment[0])  # [T+1, MAXD+1]

    # Valid block, dustbin row, dustbin column, corner.
    np.testing.assert_allclose(Z[:T, :NV], ref_Z[:T, :NV], atol=5e-4)
    np.testing.assert_allclose(Z[T, :NV], ref_Z[T, :NV], atol=5e-4)
    np.testing.assert_allclose(Z[:T, MAXD], ref_Z[:T, NV], atol=5e-4)
    np.testing.assert_allclose(Z[T, MAXD], ref_Z[T, NV], atol=5e-4)

    matches = np.asarray(out.matches[0])
    np.testing.assert_array_equal(matches[:NV], ref_matches.astype(np.int32))
    assert (matches[NV:] == -1).all()


def test_transformer_whole_model_parity(ref_models, rng):
    """Reference DETR Transformer == our Transformer under ported weights,
    including key-padding masks and the per-layer intermediate decoder stack
    (reference transformer.py:16-129)."""
    import jax.numpy as jnp

    from odam_tpu.models import porting
    from odam_tpu.models.transformer import Transformer

    ref_mod = ref_models["transformer"]
    torch.manual_seed(0)
    D, HEADS, ENC, DEC, FFN = 64, 4, 2, 2, 128
    B, H, W, Q = 2, 5, 7, 10
    ref = ref_mod.Transformer(
        d_model=D, nhead=HEADS, num_encoder_layers=ENC, num_decoder_layers=DEC,
        dim_feedforward=FFN, dropout=0.1, normalize_before=False,
        return_intermediate_dec=True,
    ).eval()

    src = rng.normal(size=(B, D, H, W)).astype(np.float32)
    pos = rng.normal(size=(B, D, H, W)).astype(np.float32) * 0.3
    query_embed = rng.normal(size=(Q, D)).astype(np.float32)
    mask = np.zeros((B, H, W), dtype=bool)
    mask[0, :, -2:] = True  # image 0 has two padded columns
    mask[1, -1, :] = True   # image 1 has one padded row

    with torch.no_grad():
        ref_hs, ref_mem = ref(
            torch.from_numpy(src), torch.from_numpy(mask),
            torch.from_numpy(query_embed), torch.from_numpy(pos),
        )
    ref_hs = ref_hs.numpy()    # [DEC, B, Q, D]
    ref_mem = ref_mem.numpy()  # [B, D, H, W]

    sd = {f"transformer.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = porting.convert_transformer(sd, enc_layers=ENC, dec_layers=DEC)

    ours = Transformer(d_model=D, num_heads=HEADS, num_encoder_layers=ENC,
                       num_decoder_layers=DEC, dim_feedforward=FFN)
    hs, mem = ours.apply(
        {"params": params},
        jnp.asarray(src.transpose(0, 2, 3, 1)),
        jnp.asarray(mask),
        jnp.asarray(query_embed),
        jnp.asarray(pos.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(hs), ref_hs, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(mem).transpose(0, 3, 1, 2), ref_mem, atol=5e-5
    )


def _torch_resnet50():
    """Minimal torch mirror of torchvision's resnet50 structure.

    torchvision is absent in this image, which is exactly why the reference
    backbone (backbone.py:84-94: ``getattr(torchvision.models, "resnet50")``
    with FrozenBatchNorm2d) needs a hand-written twin: the state-dict names
    (conv1, bn1, layerS.B.convC/bnC, layerS.B.downsample.0/1) and the
    forward composition match torchvision exactly, so porting parity here
    proves ``porting.convert_resnet50`` can be trusted on a real
    detector.pth sight-unseen.  BatchNorm2d in eval mode is numerically
    identical to the reference's FrozenBatchNorm2d (both: affine transform
    with running stats, eps 1e-5).
    """
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                    padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(tnn.Module):
        def __init__(self, layers=(3, 4, 6, 3)):
            super().__init__()
            self.inplanes = 64
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(kernel_size=3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, layers[0], stride=1)
            self.layer2 = self._make_layer(128, layers[1], stride=2)
            self.layer3 = self._make_layer(256, layers[2], stride=2)
            self.layer4 = self._make_layer(512, layers[3], stride=2)

        def _make_layer(self, planes, blocks, stride):
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
            return tnn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer1(x)
            x = self.layer2(x)
            x = self.layer3(x)
            return self.layer4(x)

    return ResNet()


def test_resnet50_composed_porting_parity(rng):
    """Composed ResNet-50 forward parity under ported weights: the full
    25M-parameter porting chain (convert_resnet50 name mapping + OIHW->HWIO
    transposes + frozen-BN semantics), not just the per-op checks in
    test_porting.py.  A transposed kernel or mis-folded BN in any one of the
    53 conv/BN pairs fails this."""
    import jax.numpy as jnp

    from odam_tpu.models import porting, resnet

    torch.manual_seed(0)
    ref = _torch_resnet50().eval()
    # Randomize BN running stats/affine away from the (1, 0) init so a
    # mean/var swap or eps mismatch is visible.
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    x = rng.normal(size=(1, 3, 96, 128)).astype(np.float32)
    with torch.no_grad():
        ref_feat = ref(torch.from_numpy(x)).numpy()  # [1, 2048, 3, 4]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = porting.convert_resnet50(sd, prefix="")

    ours = resnet.resnet50()
    feats = ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(feats[4]).transpose(0, 3, 1, 2)
    assert out.shape == ref_feat.shape
    np.testing.assert_allclose(out, ref_feat, atol=1e-3, rtol=1e-3)


def test_head_mlp_parity(ref_models, rng):
    """Reference detr.MLP prediction head == our HeadMLP under ported weights
    (reference detr.py:515-527; heads built at detr.py:37-42)."""
    import jax.numpy as jnp

    from odam_tpu.models import porting
    from odam_tpu.models.detr import HeadMLP

    ref_mod = ref_models["detr"]
    torch.manual_seed(0)
    head = ref_mod.MLP(64, 64, 4, 3).eval()
    x = rng.normal(size=(6, 10, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = head(torch.from_numpy(x)).numpy()

    sd = {f"bbox_embed.{k}": v.detach().numpy() for k, v in head.state_dict().items()}
    params = {
        f"layer{i}": porting._dense(sd, f"bbox_embed.layers.{i}") for i in range(3)
    }
    ours = HeadMLP(hidden_dim=64, out_dim=4, num_layers=3)
    out = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)
