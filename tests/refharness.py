"""Import harness for the GENUINE reference code at /root/reference/ZEGGS.

The round-1 parity evidence used a hand-rebuilt torch oracle; this harness
instead imports the reference's own ``modules.py`` / ``generate.py`` /
``data_pipeline.py`` (torch CPU) so parity tests run against the actual
reference source (VERDICT round-1, item 1).

Only environment shims are installed — no reference behavior is altered:
  * ``sox`` / ``pyloudnorm``: binary/absent deps imported at module scope
    but unused on the paths we drive (loudness normalization stays off).
  * ``omegaconf.DictConfig``: attribute-access dict (the real package is
    not installed here).
  * ``torch.load``: the reference pickles whole nn.Module objects; torch
    >= 2.6 defaults ``weights_only=True`` which refuses them, so the shim
    restores the old default the reference was written against.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference/ZEGGS")


class _DictConfig(dict):
    """Minimal omegaconf.DictConfig: recursive attribute access."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError:
            raise AttributeError(k) from None
        return _DictConfig(v) if isinstance(v, dict) else v


def _install_stubs():
    for name in ("sox", "pyloudnorm"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    # the reference's audio/__init__.py probes `sox --version` via
    # subprocess at import time; give it a no-op executable
    import os
    import stat
    import tempfile

    fake_bin = Path(tempfile.gettempdir()) / "zeggs_refharness_bin"
    fake_bin.mkdir(exist_ok=True)
    for tool in ("sox", "ffmpeg"):
        exe = fake_bin / tool
        if not exe.exists():
            exe.write_text("#!/bin/sh\necho 'stub 14.4.2'\n")
            exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    if str(fake_bin) not in os.environ.get("PATH", ""):
        os.environ["PATH"] = f"{fake_bin}{os.pathsep}{os.environ.get('PATH', '')}"
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.DictConfig = _DictConfig
        sys.modules["omegaconf"] = om
    # scipy >= 1.13 removed scipy.signal.hann (now signal.windows.hann);
    # restore the alias the reference was written against
    import scipy.signal as sps

    if not hasattr(sps, "hann"):
        sps.hann = sps.windows.hann


def _patch_torch_load():
    import torch

    if getattr(torch.load, "__zeggs_refharness__", False):
        return
    orig = torch.load

    def load(*args, **kwargs):
        kwargs.setdefault("weights_only", False)
        return orig(*args, **kwargs)

    load.__zeggs_refharness__ = True
    torch.load = load


def import_reference():
    """Import and return the reference modules as a namespace. Raises
    ImportError when /root/reference is unavailable (tests skip then)."""
    if not REFERENCE_ROOT.exists():
        raise ImportError(f"{REFERENCE_ROOT} not present")
    _install_stubs()
    _patch_torch_load()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    # an earlier torch_compat unpickle may have installed the lightweight
    # 'modules' shim — evict it so the genuine reference module imports
    existing = sys.modules.get("modules")
    if existing is not None and getattr(existing, "__zeggs_shim__", False):
        del sys.modules["modules"]
    ns = types.SimpleNamespace()
    import modules as ref_modules  # noqa: E402 — the reference's modules.py

    if not hasattr(ref_modules, "Decoder"):
        raise ImportError("unexpected 'modules' module shadows the reference")
    import data_pipeline as ref_data_pipeline  # noqa: E402
    import generate as ref_generate  # noqa: E402
    import optimizers as ref_optimizers  # noqa: E402
    import utils as ref_utils  # noqa: E402
    from audio import spectrograms as ref_spectrograms  # noqa: E402

    ns.modules = ref_modules
    ns.data_pipeline = ref_data_pipeline
    ns.generate = ref_generate
    ns.optimizers = ref_optimizers
    ns.utils = ref_utils
    ns.spectrograms = ref_spectrograms
    return ns


_LOSS_BLOCK_START = "# Compute Character/World Space"
_LOSS_BLOCK_END = "# Backward"

_LOSS_TERMS = (
    "loss_root_pos", "loss_root_rot", "loss_root_vel", "loss_root_vrt",
    "loss_lpos", "loss_lrot", "loss_lvel", "loss_lvrt",
    "loss_cpos", "loss_crot", "loss_cvel", "loss_cvrt",
    "loss_ldvl", "loss_ldvt", "loss_cdvl", "loss_cdvt",
    "loss_gaze", "loss_kl_div",
)


def run_reference_loss_block(ref, O, W, gaze_pos, parents, dt, mu, logvar, iteration):
    """Execute the GENUINE training-loss source of the reference —
    the world-space reconstruction + 18-term block at train.py:276-421 —
    character for character, on the given torch tensors.

    The block is inline inside ``train()`` so it cannot be called as a
    function; instead the exact source lines between the reference's own
    section markers are extracted, dedented, and exec'd in a namespace
    providing the same names train.py imports (``from anim.tquat import *``,
    ``from anim.txform import *``, ``modules.normalize`` /
    ``compute_KL_div``). Returns (loss tensor, {term_name: tensor}).

    O / W: dicts with keys root_pos, root_rot, root_vel, root_vrt, lpos,
    ltxy, lvel, lvrt holding (B, T, ...) torch tensors (outputs / ground
    truth); gradients flow through O.
    """
    import textwrap

    import anim.tquat as ref_tquat  # noqa: E402 — reference sys.path
    import anim.txform as ref_txform  # noqa: E402
    import torch

    src = (REFERENCE_ROOT / "train.py").read_text().splitlines()
    start = next(i for i, l in enumerate(src) if _LOSS_BLOCK_START in l)
    end = next(i for i, l in enumerate(src) if l.strip() == _LOSS_BLOCK_END)
    block = textwrap.dedent("\n".join(src[start:end]))
    code = compile(block, str(REFERENCE_ROOT / "train.py"), "exec")

    ns = {}
    ns.update({k: v for k, v in vars(ref_tquat).items() if not k.startswith("_")})
    ns.update({k: v for k, v in vars(ref_txform).items() if not k.startswith("_")})
    ns.update(
        torch=torch,
        normalize=ref.modules.normalize,
        compute_KL_div=ref.modules.compute_KL_div,
        parents=parents,
        dt=dt,
        mu=mu,
        logvar=logvar,
        iteration=iteration,
        W_gaze_pos=gaze_pos,
    )
    for k, v in O.items():
        ns[f"O_{k}"] = v
    for k, v in W.items():
        ns[f"W_{k}"] = v
    exec(code, ns)
    terms = {k: ns[k] for k in _LOSS_TERMS}
    return ns["loss"], terms
