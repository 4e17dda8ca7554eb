"""CLI flag wiring: the --tn-plan flagship-configuration contract.

Round-5 unification (VERDICT r4 #1): ``benchmark`` defaults to the
full-sequence TransNet plan (the configuration ``bench.py`` measures and
``docs/PREFLIGHT.md`` step 2 runs), ``crop`` stays on the reference's
windowed plan (replicate-by-default; justified in ``docs/PERF.md``).
These tests pin the defaults and the crop_params/predictor wiring without
compiling anything.
"""

import pytest

import retargetvid_tpu.cli as cli


def _capture(monkeypatch):
    captured = {}
    monkeypatch.setattr(cli, 'cmd_benchmark',
                        lambda a: captured.setdefault('benchmark', a))
    monkeypatch.setattr(cli, 'cmd_crop',
                        lambda a: captured.setdefault('crop', a))
    return captured


def test_tn_plan_defaults(monkeypatch):
    captured = _capture(monkeypatch)
    cli.main(['benchmark'])
    cli.main(['crop', 'x.mp4'])
    assert captured['benchmark'].tn_plan == 'fullseq'
    assert captured['crop'].tn_plan == 'windowed'
    assert cli._tn_fullseq(captured['benchmark']) is True
    assert cli._tn_fullseq(captured['crop']) is False


def test_tn_plan_overrides(monkeypatch):
    captured = _capture(monkeypatch)
    cli.main(['benchmark', '--tn-plan', 'windowed'])
    cli.main(['crop', 'x.mp4', '--tn-plan', 'fullseq'])
    assert captured['benchmark'].tn_plan == 'windowed'
    assert captured['crop'].tn_plan == 'fullseq'


def test_tn_plan_rejects_unknown(monkeypatch, capsys):
    _capture(monkeypatch)
    with pytest.raises(SystemExit):
        cli.main(['benchmark', '--tn-plan', 'bogus'])


def test_tn_plan_reaches_crop_params_and_predictor(monkeypatch, tmp_path):
    """cmd_benchmark must surface the flag both as the
    ``tpu_transnet_fullseq`` crop_params key (consumed by the one-shot
    programs, cli.py dispatch sites) and as the streaming
    ``TransNetPredictor.fullseq`` attribute (via ``_build_models``)."""
    seen = {}

    def fake_smart_vid_crop(path, cp, **kw):
        seen['cp'] = cp
        seen['tn'] = kw['transnet_fn']
        raise RuntimeError('stop after capture')

    monkeypatch.setattr('retargetvid_tpu.pipeline.crop.smart_vid_crop',
                        fake_smart_vid_crop)
    vids = tmp_path / 'vids'
    vids.mkdir()
    (vids / '001.mp4').write_bytes(b'\x00')  # glob hit; never decoded
    with pytest.raises(RuntimeError, match='stop after capture'):
        cli.main(['benchmark', '--videos', str(vids), '--out',
                  str(tmp_path / 'out'), '--replace-existing'])
    assert seen['cp']['tpu_transnet_fullseq'] is True
    assert seen['tn'].fullseq is True

    seen.clear()
    with pytest.raises(RuntimeError, match='stop after capture'):
        cli.main(['benchmark', '--videos', str(vids), '--out',
                  str(tmp_path / 'out'), '--replace-existing',
                  '--tn-plan', 'windowed'])
    assert seen['cp']['tpu_transnet_fullseq'] is False
    assert seen['tn'].fullseq is False
