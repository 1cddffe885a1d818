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
    import utils as ref_utils  # noqa: E402
    from audio import spectrograms as ref_spectrograms  # noqa: E402

    ns.modules = ref_modules
    ns.data_pipeline = ref_data_pipeline
    ns.generate = ref_generate
    ns.utils = ref_utils
    ns.spectrograms = ref_spectrograms
    return ns
