"""Import the PyTorch reference (/root/reference/AVMOE) for parity testing.

The reference pins packages absent from this environment (torchlibrosa,
librosa, timm, ipdb, loralib, easydict). This module installs minimal
functional stand-ins so the reference's OWN model code runs unmodified on
CPU with random weights; parity tests then compare its activations against
the avmoe_tpu flax re-implementations.

Stub notes:
  * torchlibrosa.stft.Spectrogram / LogmelFilterBank are re-implemented on
    torch.stft + the Slaney mel matrix from avmoe_tpu.audio.frontend
    (that matrix is itself golden-tested against recorded torchlibrosa
    outputs in tests/test_audio_frontend.py, so this is not circular for
    the transformer-stack parity these tests target).
  * timm.models.layers.DropPath/to_2tuple/trunc_normal_ follow the timm
    definitions (DropPath is identity in eval mode, which is all parity
    tests use).
  * .cuda() is patched to a no-op so reference code with hardcoded .cuda()
    calls (e.g. avs_ms3/loss.py:118) runs on CPU.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF_ROOT = "/root/reference/AVMOE"
REF_AVE = f"{REF_ROOT}/AVE"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec-based probes
        # (e.g. transformers.utils.import_utils) don't choke on the stub
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _DropPath(nn.Module):
    """timm DropPath (stochastic depth); identity when eval or p=0."""

    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rand = x.new_empty(shape).bernoulli_(keep)
        if self.scale_by_keep:
            rand = rand / keep
        return x * rand


def _to_2tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class _VitAttention(nn.Module):
    """timm.models.vision_transformer.Attention-compatible block."""

    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0, proj_drop=0.0, **kw):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = self.attn_drop(attn.softmax(dim=-1))
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj_drop(self.proj(x))


def _install_timm() -> None:
    timm = _stub("timm")
    models = _stub("timm.models")
    timm.models = models
    layers = _stub(
        "timm.models.layers",
        DropPath=_DropPath,
        to_2tuple=_to_2tuple,
        trunc_normal_=nn.init.trunc_normal_,
    )
    vit = _stub(
        "timm.models.vision_transformer",
        Attention=_VitAttention,
        _cfg=lambda url="", **kw: dict(url=url, **kw),
    )
    registry = _stub("timm.models.registry", register_model=lambda f: f)
    models.layers = layers
    models.vision_transformer = vit
    models.registry = registry

    def _create_model(*a, **kw):  # overridden per-test when needed
        raise NotImplementedError(
            "timm stub: monkeypatch timm.create_model in the test")

    timm.create_model = _create_model


def _install_torchlibrosa() -> None:
    from avmoe_tpu.audio.frontend import mel_filterbank

    class Spectrogram(nn.Module):
        """Power spectrogram, torchlibrosa conventions: (B, L) -> (B, 1, T, F)."""

        def __init__(self, n_fft=2048, hop_length=None, win_length=None,
                     window="hann", center=True, pad_mode="reflect",
                     power=2.0, freeze_parameters=True):
            super().__init__()
            assert window == "hann" and power == 2.0
            self.n_fft = n_fft
            self.hop_length = hop_length or n_fft // 4
            self.win_length = win_length or n_fft
            self.center = center
            self.pad_mode = pad_mode
            self.register_buffer("window", torch.hann_window(self.win_length),
                                 persistent=False)

        def forward(self, x):
            s = torch.stft(
                x, self.n_fft, hop_length=self.hop_length,
                win_length=self.win_length, window=self.window,
                center=self.center, pad_mode=self.pad_mode,
                return_complex=True)
            p = (s.real ** 2 + s.imag ** 2).transpose(1, 2)  # (B, T, F)
            return p[:, None]

    class LogmelFilterBank(nn.Module):
        def __init__(self, sr=22050, n_fft=2048, n_mels=64, fmin=0.0,
                     fmax=None, is_log=True, ref=1.0, amin=1e-10,
                     top_db=80.0, freeze_parameters=True):
            super().__init__()
            self.is_log, self.ref, self.amin, self.top_db = is_log, ref, amin, top_db
            melW = mel_filterbank(sr, n_fft, n_mels, fmin, fmax or sr / 2)
            self.register_buffer("melW", torch.from_numpy(np.asarray(melW)),
                                 persistent=False)

        def forward(self, x):  # (B, 1, T, F) -> (B, 1, T, M)
            mel = torch.matmul(x, self.melW)
            if not self.is_log:
                return mel
            log_spec = 10.0 * torch.log10(torch.clamp(mel, min=self.amin))
            log_spec -= 10.0 * np.log10(np.maximum(self.amin, self.ref))
            if self.top_db is not None:
                log_spec = torch.clamp(
                    log_spec, min=log_spec.max().item() - self.top_db)
            return log_spec

    class SpecAugmentation(nn.Module):
        """Parity tests run eval-mode; train-mode masking is not reproduced."""

        def __init__(self, **kw):
            super().__init__()

        def forward(self, x):
            assert not self.training, "stub SpecAugmentation is eval-only"
            return x

    tl = _stub("torchlibrosa")
    tl.stft = _stub("torchlibrosa.stft",
                    Spectrogram=Spectrogram, LogmelFilterBank=LogmelFilterBank)
    tl.augmentation = _stub("torchlibrosa.augmentation",
                            SpecAugmentation=SpecAugmentation)


_installed = False


def install_stubs() -> None:
    global _installed
    if _installed:
        return
    _stub("ipdb", set_trace=lambda *a, **k: None)
    _stub("librosa")
    # net_avst_v2.py imports torchvision.models but never uses it (its
    # resnet18 comes from the vendored visual_net.py)
    tv_models = _stub("torchvision.models")
    _stub("torchvision", models=tv_models)
    _stub("loralib")
    _stub("resampy")
    _stub("soundfile")
    _stub("easydict", EasyDict=lambda d=None, **kw: types.SimpleNamespace(**(d or {}), **kw))
    _install_timm()
    _install_torchlibrosa()
    # reference code hardcodes .cuda(); run it on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    _installed = True


def load_ref_module(sys_path: str, module: str) -> types.ModuleType:
    """Import `module` (dotted) with `sys_path` prepended; namespace packages
    cover the reference's __init__-less dirs."""
    install_stubs()
    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    return importlib.import_module(module)


def load_ref_tree(sys_path: str, module: str,
                  top_packages=("nets",)) -> types.ModuleType:
    """Import `module` from `sys_path`, isolating top-level package name
    collisions: AVE, AVVP and AVQA all define a `nets` package, so previously
    imported `nets.*` entries are stashed, the import runs with `sys_path`
    first on the path, and afterwards the new entries are removed and the
    stash restored (the returned module object keeps its own references)."""
    install_stubs()

    def _mine(name: str) -> bool:
        return any(name == p or name.startswith(p + ".") for p in top_packages)

    stash = {k: sys.modules.pop(k) for k in list(sys.modules) if _mine(k)}
    sys.path.insert(0, sys_path)
    try:
        mod = importlib.import_module(module)
    finally:
        sys.path.remove(sys_path)
        for k in list(sys.modules):
            if _mine(k):
                del sys.modules[k]
        sys.modules.update(stash)
    return mod


def load_ref_file(path: str, name: str) -> types.ModuleType:
    """Import a single reference file that uses no relative imports."""
    install_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
