"""v-diffusion upstream-executor golden tests vs an independent torch execution.

Builds REAL torch modules (nn.Sequential / SkipBlock / ResConvBlock /
ResModConvBlock / SelfAttention2d, written here to the published
v-diffusion-pytorch semantics) from the same spec the JAX executor runs,
randomly initializes them, exports the state dict through the production
converter (`convert_vdiff_state_dict`), and checks:

  1. the torch mirror's state_dict keys+shapes == `expected_state_shapes(spec)`
     (the Sequential-numbering contract the converter depends on), and
  2. `VDiffUpstream.apply` matches the torch forward on fixed (x, t[, clip])
     fixtures at tiny scale.

Same evidence class as tests/test_slip_golden.py: proves torch-mirror <-> JAX
agreement; upstream-weight fidelity closes when a real .pth lands
(tools/validate_vdiff.py audits the signature then).
"""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from pixray_tpu.models.vdiff_upstream import (  # noqa: E402
    UPSTREAM_SPECS,
    VDiffUpstream,
    convert_vdiff_state_dict,
    expected_state_shapes,
)


# --------------------------------------------------------------------- mirror
class FourierFeatures(nn.Module):
    def __init__(self, in_features, out_features, std=1.0):
        super().__init__()
        self.weight = nn.Parameter(torch.randn([out_features // 2, in_features]) * std)

    def forward(self, x):
        f = 2 * math.pi * x @ self.weight.T
        return torch.cat([f.cos(), f.sin()], dim=-1)


class ResidualBlock(nn.Module):
    def __init__(self, main, skip=None):
        super().__init__()
        self.main = nn.Sequential(*main)
        self.skip = skip if skip else nn.Identity()

    def forward(self, x):
        return self.main(x) + self.skip(x)


class ResConvBlock(ResidualBlock):
    def __init__(self, c_in, c_mid, c_out, is_last=False):
        skip = None if c_in == c_out else nn.Conv2d(c_in, c_out, 1, bias=False)
        super().__init__(
            [
                nn.Conv2d(c_in, c_mid, 3, padding=1),
                nn.ReLU(inplace=True),
                nn.Conv2d(c_mid, c_out, 3, padding=1),
                nn.ReLU(inplace=True) if not is_last else nn.Identity(),
            ],
            skip,
        )


class ResLinearBlock(ResidualBlock):
    def __init__(self, f_in, f_mid, f_out, is_last=False):
        skip = None if f_in == f_out else nn.Linear(f_in, f_out, bias=False)
        super().__init__(
            [
                nn.Linear(f_in, f_mid),
                nn.ReLU(inplace=True),
                nn.Linear(f_mid, f_out),
                nn.ReLU(inplace=True) if not is_last else nn.Identity(),
            ],
            skip,
        )


class Modulation2d(nn.Module):
    def __init__(self, state, feats_in, c_out):
        super().__init__()
        self.state = state
        self.layer = nn.Linear(feats_in, c_out * 2, bias=False)

    def forward(self, x):
        scales, shifts = self.layer(self.state["cond"]).chunk(2, dim=-1)
        return torch.addcmul(shifts[..., None, None], x, scales[..., None, None] + 1)


class ResModConvBlock(ResidualBlock):
    def __init__(self, state, feats_in, c_in, c_mid, c_out, is_last=False):
        skip = None if c_in == c_out else nn.Conv2d(c_in, c_out, 1, bias=False)
        super().__init__(
            [
                nn.Conv2d(c_in, c_mid, 3, padding=1),
                nn.GroupNorm(1, c_mid, affine=False),
                Modulation2d(state, feats_in, c_mid),
                nn.ReLU(inplace=True),
                nn.Conv2d(c_mid, c_out, 3, padding=1),
                nn.GroupNorm(1, c_out, affine=False) if not is_last else nn.Identity(),
                Modulation2d(state, feats_in, c_out) if not is_last else nn.Identity(),
                nn.ReLU(inplace=True) if not is_last else nn.Identity(),
            ],
            skip,
        )


class SelfAttention2d(nn.Module):
    def __init__(self, c_in, n_head=1):
        super().__init__()
        assert c_in % n_head == 0
        self.norm = nn.GroupNorm(1, c_in)
        self.n_head = n_head
        self.qkv_proj = nn.Conv2d(c_in, c_in * 3, 1)
        self.out_proj = nn.Conv2d(c_in, c_in, 1)

    def forward(self, x):
        n, c, h, w = x.shape
        qkv = self.qkv_proj(self.norm(x))
        qkv = qkv.view([n, self.n_head * 3, c // self.n_head, h * w]).transpose(2, 3)
        q, k, v = qkv.chunk(3, dim=1)
        scale = k.shape[3] ** -0.25
        att = ((q * scale) @ (k.transpose(2, 3) * scale)).softmax(3)
        y = (att @ v).transpose(2, 3).contiguous().view([n, c, h, w])
        return x + self.out_proj(y)


class SkipBlock(nn.Module):
    def __init__(self, main):
        super().__init__()
        self.main = nn.Sequential(*main)
        self.skip = nn.Identity()

    def forward(self, x):
        return torch.cat([self.main(x), self.skip(x)], dim=1)


def _ops_to_torch(ops, state):
    mods = []
    for op in ops:
        kind = op[0]
        if kind == "conv":
            mods.append(ResConvBlock(op[1], op[2], op[3], op[4]))
        elif kind == "modconv":
            mods.append(ResModConvBlock(state, state["feats_in"], op[1], op[2], op[3], op[4]))
        elif kind == "attn":
            mods.append(SelfAttention2d(op[1], op[2]))
        elif kind == "down":
            mods.append(nn.AvgPool2d(2))
        elif kind == "up":
            mods.append(nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False))
        elif kind == "skip":
            mods.append(SkipBlock(_ops_to_torch(op[1], state)))
        else:
            raise ValueError(op)
    return mods


class TorchUpstream(nn.Module):
    """The full upstream model assembled from a spec."""

    def __init__(self, spec):
        super().__init__()
        self.spec = spec
        self.state = {"feats_in": spec.mapping_width}
        self.timestep_embed = FourierFeatures(1, spec.input_ff)
        if spec.conv_kind == "modconv":
            w, ed, ff = spec.mapping_width, spec.clip_embed_dim, spec.mapping_ff
            self.mapping_timestep_embed = FourierFeatures(1, ff)
            self.mapping = nn.Sequential(
                ResLinearBlock(ed + ff, w, w),
                ResLinearBlock(w, w, w, is_last=True),
            )
        self.net = nn.Sequential(*_ops_to_torch(spec.net, self.state))

    def forward(self, x, t, clip_embed=None):
        spec = self.spec
        if spec.conv_kind == "modconv":
            ce = torch.nn.functional.normalize(clip_embed, dim=-1) * spec.clip_embed_dim**0.5
            mt = self.mapping_timestep_embed(t[:, None])
            self.state["cond"] = self.mapping(torch.cat([ce, mt], dim=1))
        te = self.timestep_embed(t[:, None])
        planes = te[..., None, None].repeat([1, 1, x.shape[2], x.shape[3]])
        out = self.net(torch.cat([x, planes], dim=1))
        self.state.pop("cond", None)
        return out


# ---------------------------------------------------------------------- tests
@pytest.mark.parametrize("name", ["tiny_up", "tiny_up_mod"])
def test_state_shape_contract(name):
    spec = UPSTREAM_SPECS[name]
    mirror = TorchUpstream(spec)
    got = {k: tuple(v.shape) for k, v in mirror.state_dict().items()}
    # state dict must agree on the exact key set AND shapes — this is the
    # Sequential-numbering contract a real .pth will be converted under
    assert got == expected_state_shapes(spec)


@pytest.mark.parametrize("name", ["tiny_up", "tiny_up_mod"])
def test_pred_parity(name):
    spec = UPSTREAM_SPECS[name]
    torch.manual_seed(7)
    mirror = TorchUpstream(spec).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = convert_vdiff_state_dict(sd, spec)

    r = spec.resolution
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, r, r, 3)).astype(np.float32)
    t = np.array([0.3, 0.8], dtype=np.float32)
    ce = (
        rng.standard_normal((2, spec.clip_embed_dim)).astype(np.float32)
        if spec.conv_kind == "modconv"
        else None
    )

    with torch.no_grad():
        ref = mirror(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            torch.from_numpy(ce) if ce is not None else None,
        ).permute(0, 2, 3, 1).numpy()

    model = VDiffUpstream(spec)
    out = np.asarray(model.apply(params, x, t, ce))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_full_scale_specs_build():
    # every real checkpoint name must produce a buildable signature with the
    # documented channel progression (a wrong table is caught by
    # tools/validate_vdiff.py when an asset lands; this guards regressions)
    for name in ("yfcc_2", "cc12m_1", "danbooru_128", "wikiart_256"):
        shapes = expected_state_shapes(UPSTREAM_SPECS[name])
        assert len(shapes) > 100
        assert shapes["timestep_embed.weight"] == (8, 1)


def test_param_counts_match_published():
    """Spec totals must match the published v-diffusion-pytorch README
    parameter counts to <1% — the checksum the reconstructed channel tables
    are pinned against (vdiff_upstream.PUBLISHED_PARAM_COUNTS_M)."""
    from pixray_tpu.models.vdiff_upstream import PUBLISHED_PARAM_COUNTS_M

    for name, tgt_m in PUBLISHED_PARAM_COUNTS_M.items():
        shapes = expected_state_shapes(UPSTREAM_SPECS[name])
        tot_m = sum(int(np.prod(s)) for s in shapes.values()) / 1e6
        assert abs(tot_m - tgt_m) < tgt_m * 0.01, (
            f"{name}: spec gives {tot_m:.1f}M params, published {tgt_m}M"
        )
