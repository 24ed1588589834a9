"""Parity tests for torch-checkpoint porting: flax modules fed converted
weights must reproduce the torch ops' outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from odam_tpu.models import porting
from odam_tpu.models.transformer import MultiHeadAttention
from odam_tpu.models.associator import AttentionalPropagation, ChannelMLP


def test_conv2d_kernel_transpose():
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1, bias=False)
    x = torch.randn(1, 3, 8, 8)
    ref = tconv(x).detach().numpy()

    import flax.linen as nn

    fconv = nn.Conv(5, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    params = {"params": {"kernel": porting._conv(tconv.weight.detach().numpy())}}
    out = fconv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5
    )


def test_packed_mha_matches_torch():
    D, H, B, L = 32, 4, 2, 7
    tmha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    tmha.eval()
    q = torch.randn(B, L, D)
    kpm = torch.zeros(B, L, dtype=torch.bool)
    kpm[:, -2:] = True  # pad last two keys
    with torch.no_grad():
        ref, _ = tmha(q, q, q, key_padding_mask=kpm)

    sd = {f"attn.{k}": v.detach().numpy() for k, v in tmha.state_dict().items()}
    params = porting._packed_mha(sd, "attn")
    fmha = MultiHeadAttention(d_model=D, num_heads=H)
    out = fmha.apply(
        {"params": params}, jnp.asarray(q.numpy()), jnp.asarray(q.numpy()),
        jnp.asarray(q.numpy()), jnp.asarray(kpm.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


class _TorchHeadMinorAttention(torch.nn.Module):
    """Reference-style attention with head-minor channel grouping
    (matches the math of associator.py:47-88; written fresh for the test)."""

    def __init__(self, d_model, num_heads):
        super().__init__()
        self.dim = d_model // num_heads
        self.num_heads = num_heads
        self.merge = torch.nn.Conv1d(d_model, d_model, kernel_size=1)
        self.proj = torch.nn.ModuleList(
            [torch.nn.Conv1d(d_model, d_model, kernel_size=1) for _ in range(3)]
        )
        self.mlp = torch.nn.Sequential(
            torch.nn.Conv1d(d_model * 2, d_model * 2, 1),
            torch.nn.ReLU(),
            torch.nn.Conv1d(d_model * 2, d_model, 1),
        )

    def forward(self, x, source):
        # x, source: [B, D, L]
        B = x.size(0)
        q, k, v = [
            layer(t).view(B, self.dim, self.num_heads, -1)
            for layer, t in zip(self.proj, (x, source, source))
        ]
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / self.dim ** 0.5
        prob = torch.nn.functional.softmax(scores, dim=-1)
        msg = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        msg = self.merge(msg.contiguous().view(B, self.dim * self.num_heads, -1))
        return self.mlp(torch.cat([x, msg], dim=1))


def test_associator_attention_porting():
    D, H, B, L = 32, 4, 1, 6
    tmod = _TorchHeadMinorAttention(D, H).eval()
    x = torch.randn(B, D, L)
    src = torch.randn(B, D, L)
    with torch.no_grad():
        ref = tmod(x, src).numpy()

    # The real checkpoint nests proj/merge under ".attn" (AttentionalPropagation
    # holds a MultiHeadedAttention); remap the flat test module accordingly.
    sd = {}
    for k, v in tmod.state_dict().items():
        key = f"p.{k}" if k.startswith("mlp") else f"p.attn.{k}"
        sd[key] = v.detach().numpy()
    params = porting._assoc_prop(sd, "p", D, H)
    fmod = AttentionalPropagation(d_model=D, num_heads=H)
    out = fmod.apply(
        {"params": params},
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
        jnp.asarray(src.numpy().transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref, atol=2e-5
    )


def test_conv1d_stack_matches_channel_mlp():
    tmod = torch.nn.Sequential(
        torch.nn.Conv1d(78, 32, 1), torch.nn.ReLU(), torch.nn.Conv1d(32, 32, 1)
    ).eval()
    x = torch.randn(1, 78, 5)
    with torch.no_grad():
        ref = tmod(x).numpy()
    params = {
        "layer0": {"kernel": porting._conv1d_dense(tmod[0].weight.detach().numpy()),
                   "bias": tmod[0].bias.detach().numpy()},
        "layer1": {"kernel": porting._conv1d_dense(tmod[2].weight.detach().numpy()),
                   "bias": tmod[2].bias.detach().numpy()},
    }
    fmod = ChannelMLP((78, 32, 32))
    out = fmod.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=2e-5)


def test_timestep_encoding_matches_reference_formula():
    """Reference PE (associator.py:315-327): even ch sin(pos*w_i), odd ch
    cos(pos*w_i) with w_i = exp(2i * -ln(1e4)/d)."""
    from odam_tpu.models import position

    d = 16
    pos = np.array([0.0, 3.0, 41.0])
    div = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
    expected = np.zeros((3, d))
    expected[:, 0::2] = np.sin(pos[:, None] * div)
    expected[:, 1::2] = np.cos(pos[:, None] * div)
    out = np.asarray(position.timestep_encoding(jnp.asarray(pos), d_model=d))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_frozen_bn_matches_torch_eval_bn():
    tbn = torch.nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.uniform_(-0.5, 0.5)
        tbn.running_mean.uniform_(-1, 1)
        tbn.running_var.uniform_(0.5, 2.0)
    x = torch.randn(1, 6, 4, 4)
    with torch.no_grad():
        ref = tbn(x).numpy()

    from odam_tpu.models.resnet import FrozenBatchNorm

    sd = {f"bn.{k}": v.detach().numpy() for k, v in tbn.state_dict().items()}
    params = porting._bn(sd, "bn")
    out = FrozenBatchNorm(6).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
    )
