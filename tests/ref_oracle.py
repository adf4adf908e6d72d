"""Load the reference implementation at /root/reference as a numerical oracle.

The reference (CUDA/torch) is driven READ-ONLY on CPU to produce ground-truth
outputs for full-forward pixel-parity tests. Hurdles handled here:

  * configs/config.py argparses at import time (configs/config.py:72-80) ->
    pre-seed sys.argv with a --cfg pointing at a generated yaml.
  * component_factory uses `imp.load_source` (removed in Python 3.12) ->
    install an importlib-based shim.
  * relative module/config paths -> chdir into the reference tree during
    import and network construction.
  * `torchvision` is not installed (rgb_feature.py:3) -> stub module; the
    RGB-history path is never constructed when cfg.rgb_history.last_num == 0.
  * no CUDA -> primary/secondary gpus pinned to ['cpu'] via the yaml (the
    forked yacs silently adds unknown keys, third_parties/yacs/yacs.py:386);
    nn.DataParallel falls back to plain module calls without CUDA.

Import-once semantics: the reference cfg is a module-level singleton, so one
process gets exactly one reference config. Mutate `ref.cfg` for small
follow-up tweaks instead of re-importing.
"""

from __future__ import annotations

import contextlib
import importlib
import importlib.machinery
import importlib.util
import os
import sys
import types

REF_DIR = "/root/reference"

_cache: dict = {}


def _install_imp_shim():
    if "imp" in sys.modules:
        return
    imp = types.ModuleType("imp")

    def load_source(name, path):
        loader = importlib.machinery.SourceFileLoader(name, path)
        spec = importlib.util.spec_from_loader(name, loader)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        loader.exec_module(mod)
        return mod

    imp.load_source = load_source
    sys.modules["imp"] = imp


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    transforms = types.ModuleType("torchvision.transforms")

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stub: pretrained CNNs unavailable")

    models.resnet34 = _unavailable
    models.vgg16 = _unavailable
    # rgb_feature.py:6-9 builds a transforms.Compose at module import time
    transforms.Compose = lambda fns: (lambda x: x)
    transforms.Normalize = lambda *a, **k: (lambda x: x)
    transforms.ToTensor = lambda *a, **k: (lambda x: x)
    tv.models, tv.transforms = models, transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = transforms


@contextlib.contextmanager
def _in_ref_dir():
    old = os.getcwd()
    os.chdir(REF_DIR)
    try:
        yield
    finally:
        os.chdir(old)


DEFAULT_ORACLE_YAML = """
task: oracle
subject: synth
experiment: oracle
primary_gpus: ['cpu']
secondary_gpus: ['cpu']
N_samples: 32
perturb: 0.
netchunk_per_gpu: 100000
num_workers: 0
"""


def load_reference(extra_yaml: str = "", opts: tuple = ()):
    """Import the reference with a pinned config; returns its network module.

    Only callable once per process (the reference cfg is import-time global).
    """
    if "network_module" in _cache:
        if extra_yaml or opts:
            raise RuntimeError("reference already imported with another cfg")
        return _cache["network_module"]

    _install_imp_shim()
    _install_torchvision_stub()

    import tempfile
    yaml_path = os.path.join(tempfile.mkdtemp(prefix="ref_oracle_"),
                             "oracle.yaml")
    with open(yaml_path, "w") as f:
        f.write(DEFAULT_ORACLE_YAML + "\n" + extra_yaml)

    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    old_argv = sys.argv
    sys.argv = ["oracle", "--cfg", yaml_path] + list(opts)
    try:
        with _in_ref_dir():
            net_mod = importlib.import_module("core.nets.human_nerf.network")
    finally:
        sys.argv = old_argv
    _cache["network_module"] = net_mod
    return net_mod


def build_reference_network(seed: int = 0):
    """Construct the reference Network() (random torch init) in eval mode."""
    net_mod = load_reference()
    import torch
    torch.manual_seed(seed)
    with _in_ref_dir():       # component_factory resolves relative paths
        net = net_mod.Network()
    return net.eval()
