"""Crop-parameter configuration for the SmartVidCrop-compatible pipeline.

Reproduces the public tuning surface of the reference
(``smartVidCrop.py:132-209``): a flat dict of ~30 knobs with two published
presets — the ICIP-2021 defaults and the ISM-2021 "best settings"
(``use_best_settings=True``).  Key names (including historical spellings such
as ``foces_stab_t``) are preserved verbatim so configs written for the
reference work unchanged.

TPU-specific knobs are added under names that do not collide with the
reference surface (prefix ``tpu_``); the reference-compatible keys keep their
exact reference semantics.
"""

from __future__ import annotations

import json
from typing import Any


def sc_init_crop_params(print_dict: bool = False,
                        use_best_settings: bool = False) -> dict:
    """Return the SmartVidCrop parameter dict.

    Parity with reference ``smartVidCrop.py:132-209``.  Two presets:
    the ICIP-2021 defaults and (``use_best_settings=True``) the ISM-2021
    settings.
    """
    crop_params: dict[str, Any] = {}

    crop_params['out_ratio'] = "4:5"
    crop_params['max_input_d'] = 250
    crop_params['skip'] = 6
    crop_params['read_batch'] = 2000

    crop_params['resize_factor'] = 1.0
    crop_params['resize_type'] = 1          # 1: bilinear, 2: cubic, 3: nearest

    crop_params['op_close'] = True
    crop_params['value_bias'] = 1.0         # bias of value -> 3rd clustering dim

    crop_params['exit_on_spread_sal'] = False
    crop_params['exit_on_low_cvrg'] = False

    crop_params['com_km'] = True            # kmeans center-of-mass, else argmax

    crop_params['clust_filt'] = True
    crop_params['select_sum'] = 2           # 1: cluster w/ max sum, else max value
    crop_params['min_d_jump'] = 10          # min pixel distance for a focus jump

    crop_params['focus_stability'] = False
    crop_params['foces_stab_t'] = 60        # (sic) reference spelling preserved
    crop_params['foces_stab_s'] = 1.5

    crop_params['hdbscan_min'] = 26         # min cluster size (density filter)
    crop_params['hdbscan_min_samples'] = None

    crop_params['shift_time'] = 0

    crop_params['loess_filt'] = 1
    crop_params['loess_w_secs'] = 2
    crop_params['loess_degree'] = 2

    crop_params['lp_filt'] = 1
    crop_params['lp_cutoff'] = 2
    crop_params['lp_order'] = 5

    crop_params['t_sal'] = 40               # pad if mean saliency above this
    crop_params['t_cvrg'] = 0.60            # pad if coverage below this
    crop_params['t_threshold'] = 120
    crop_params['t_border'] = -1            # -1 disables border detection

    crop_params['t_cut'] = 120              # low-saliency jump => extra cut

    if use_best_settings:
        # ISM-2021 settings (reference smartVidCrop.py:186-202)
        crop_params['t_threshold'] = 90
        crop_params['hdbscan_min'] = 5
        crop_params['hdbscan_min_samples'] = 3
        crop_params['min_d_jump'] = 1
        crop_params['resize_factor'] = 4
        crop_params['op_close'] = True
        crop_params['value_bias'] = 1.0
        crop_params['select_sum'] = 1
        crop_params['focus_stability'] = True
        crop_params['foces_stab_t'] = 60
        crop_params['foces_stab_s'] = 1.5
        crop_params['t_border'] = -1
        crop_params['lp_filt'] = 1
        crop_params['lp_cutoff'] = 1
        crop_params['lp_order'] = 2
        crop_params['loess_filt'] = 0

    if print_dict:
        for k in crop_params.keys():
            print(k, ':', crop_params[k])

    return crop_params


def smart_crop_version() -> str:
    """Version string (reference ``smartVidCrop.py:2617``)."""
    return '1.4.0-tpu'


# ---------------------------------------------------------------------------
# KwConfig-style JSON round trip (reference unisal/utils.py:28-44)
# ---------------------------------------------------------------------------

class KwConfig:
    """Persist constructor kwargs to ``<ClassName>.json`` and reload.

    TPU-native counterpart of the reference's ``KwConfigClass``
    (``unisal/utils.py:28-44``): any object whose ``__init__`` kwargs are
    stored as same-named attributes can round-trip its config through JSON.
    """

    # Subclasses may list attribute names to exclude from serialization.
    config_exclude: tuple = ()

    def asdict(self) -> dict:
        import inspect
        sig = inspect.signature(self.__class__.__init__)
        out = {}
        for name in sig.parameters:
            if name == 'self' or name in self.config_exclude:
                continue
            if hasattr(self, name):
                val = getattr(self, name)
                try:
                    json.dumps(val)
                except TypeError:
                    continue
                out[name] = val
        return out

    def save_cfg(self, directory) -> None:
        import pathlib
        directory = pathlib.Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        with open(directory / f"{self.__class__.__name__}.json", 'w') as fp:
            json.dump(self.asdict(), fp, indent=2)

    @classmethod
    def init_from_cfg_dir(cls, directory, **overrides):
        import pathlib
        directory = pathlib.Path(directory)
        with open(directory / f"{cls.__name__}.json") as fp:
            cfg = json.load(fp)
        cfg.update(overrides)
        return cls(**cfg)
