"""Helpers to load the reference torch models as parity oracles.

The reference package is imported from /root/reference with a synthetic
parent package so its heavy __init__ (train/data, tensorboard deps) never
runs; ``.cuda()`` is neutralized for the CPU-only test environment.
"""

import sys
import types

UNISAL_DIR = '/root/reference/3rd_party_libs/unisal/unisal'


def load_reference_unisal_module():
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    if 'unisal' not in sys.modules:
        pkg = types.ModuleType('unisal')
        pkg.__path__ = [UNISAL_DIR]
        sys.modules['unisal'] = pkg
    import unisal.model as umodel
    return umodel


def make_reference_unisal(seed: int = 0):
    import torch
    umodel = load_reference_unisal_module()
    torch.manual_seed(seed)
    net = umodel.UNISAL(cnn_cfg={'pretrained': False})
    net.eval()
    return net
