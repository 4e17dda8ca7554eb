"""CLI benchmark subcommand end-to-end: synthetic video 001 + real annots."""

import numpy as np
import pytest

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_cli_benchmark_end_to_end(reference_dir, tmp_path, monkeypatch,
                                  capsys):
    # Synthetic 640x360 clip named 001.mp4 so the inline eval engages the
    # real annotator ground truth for video 1.
    vids = tmp_path / 'vids'
    vids.mkdir()
    h, w, n = 360, 640, 36
    yy, xx = np.mgrid[0:h, 0:w]
    writer = cv2.VideoWriter(str(vids / '001.mp4'),
                             cv2.VideoWriter_fourcc(*'mp4v'), 30.0, (w, h))
    if not writer.isOpened():
        pytest.skip('cv2 cannot encode mp4 here')
    for t in range(n):
        cx = w * (0.3 + 0.4 * t / n)
        blob = (230 * np.exp(-(((yy - h / 2) ** 2 +
                                (xx - cx) ** 2) / 2000.0))).astype(np.uint8)
        writer.write(np.stack([blob] * 3, axis=-1))
    writer.release()

    out_dir = tmp_path / 'results'
    from retargetvid_tpu.cli import main
    main(['benchmark',
          '--videos', str(vids),
          '--out', str(out_dir),
          '--test-name', 'smoke',
          '--ratios', '1:3',
          '--annotations', str(reference_dir / 'annotations'),
          '--annotations-extract', str(tmp_path / 'annots'),
          '--chunk', '8',
          '--replace-existing'])

    txt = out_dir / 'smoke' / '001_1-3.txt'
    info = out_dir / 'smoke' / '001_1-3_info.txt'
    assert txt.is_file() and info.is_file()
    from retargetvid_tpu.eval.annotations import read_boxes_file
    boxes = read_boxes_file(txt)
    assert boxes.shape == (n, 4)
    assert ((boxes[:, 2] - boxes[:, 0]) == 120).all()   # 1:3 on 640x360

    body = info.read_text()
    assert 'result:smart cropped' in body
    assert 't_total' in body and '%' in body

    # Inline eval printed per-user IoU lines.
    out = capsys.readouterr().out
    assert 'user #1:' in out and 'mean   :' in out
