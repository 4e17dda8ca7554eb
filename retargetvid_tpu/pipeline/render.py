"""Output rendering: cropped video, padded (letterboxed) video, demo video.

Host-side equivalents of ``sc_renderer`` (``smartVidCrop.py:1801-2154``) and
``sc_render_padded`` (``:2157-2213``; the reference version is dead code with
an inverted guard — implemented here with the intended semantics).  Rendering
re-decodes the source and writes per-frame crops; it is an optional output
stage off the benchmark's hot path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from retargetvid_tpu.io.video import VideoReader, probe_video, write_video

__all__ = ["render_cropped", "render_padded", "render_demo",
           "render_cropped_pickle"]


def render_cropped_pickle(pkl_path, boxes: np.ndarray, out_path=None) -> str:
    """Web-service mode: crop the frames of a reference-format ``.pkl`` clip
    and write them back as ``<stem>_sc.pkl`` (reference ``sc_renderer``'s
    pickle branch, ``smartVidCrop.py:1820-1825, 1879-1884``).

    The output pickle mirrors the input contract with cropped ``frames`` and
    updated ``w``/``h``.  Returns the output path.
    """
    import pickle

    with open(pkl_path, 'rb') as fp:
        data = pickle.load(fp)
    frames = np.asarray(data['frames'])
    boxes = np.asarray(boxes, int)
    n = min(len(frames), len(boxes))
    cropped = [frames[i][boxes[i][1]:boxes[i][3], boxes[i][0]:boxes[i][2]]
               for i in range(n)]
    out = {
        'fr': data.get('fr'),
        'frame_count': n,
        'w': int(boxes[0][2] - boxes[0][0]),
        'h': int(boxes[0][3] - boxes[0][1]),
        'frames': np.stack(cropped),
        'bbs': boxes[:n],
    }
    out_path = out_path or str(pkl_path).replace('.pkl', '_sc.pkl')
    with open(out_path, 'wb') as fp:
        pickle.dump(out, fp)
    return out_path


def render_cropped(video_path, boxes: np.ndarray, out_path,
                   fps: Optional[float] = None) -> int:
    """Write the cropped video: frame[y1:y2, x1:x2] per frame."""
    info = probe_video(video_path)
    fps = fps or info['fps']
    boxes = np.asarray(boxes, int)
    reader = VideoReader(video_path)

    def gen():
        for i, frame in enumerate(reader.frames()):
            if i >= len(boxes):
                break
            x1, y1, x2, y2 = boxes[i]
            yield frame[y1:y2, x1:x2]

    try:
        return write_video(str(out_path), gen(), fps)
    finally:
        reader.stop()


def render_padded(video_path, out_path, w_final: int, h_final: int,
                  fps: Optional[float] = None) -> int:
    """Letterbox the source into the target aspect ratio (intended
    semantics of the reference's broken ``sc_render_padded``)."""
    import cv2

    info = probe_video(video_path)
    fps = fps or info['fps']
    w, h = info['width'], info['height']
    target_ratio = w_final / h_final
    if w / h > target_ratio:
        new_w, new_h = w, int(round(w / target_ratio))
        pad_y, pad_x = (new_h - h) // 2, 0
    else:
        new_w, new_h = int(round(h * target_ratio)), h
        pad_y, pad_x = 0, (new_w - w) // 2
    reader = VideoReader(video_path)

    def gen():
        for frame in reader.frames():
            yield cv2.copyMakeBorder(
                frame, pad_y, new_h - h - pad_y, pad_x, new_w - w - pad_x,
                cv2.BORDER_CONSTANT, value=(0, 0, 0))

    try:
        return write_video(str(out_path), gen(), fps)
    finally:
        reader.stop()


def render_demo(video_path, vid_data: dict, geometry: dict, out_path,
                fps: Optional[float] = None) -> int:
    """Multi-panel demo video: original | saliency | filtered+centers |
    final box overlay (reference 5-panel demo, ``smartVidCrop.py:1924-2126``).
    """
    import cv2

    info = probe_video(video_path)
    fps = fps or info['fps']
    boxes = np.asarray(geometry['boxes'], int)
    smaps = np.asarray(vid_data['smaps'])
    filtered = geometry.get('smaps_filtered')
    if filtered is not None:
        filtered = np.asarray(filtered)
    inds_to_orig = vid_data['inds_to_orig']
    h, w = info['height'], info['width']
    panel_w = w // 2
    panel_h = h // 2
    reader = VideoReader(video_path)

    def panel(img):
        return cv2.resize(img, (panel_w, panel_h))

    def gen():
        for i, frame in enumerate(reader.frames()):
            if i >= len(boxes):
                break
            sel = inds_to_orig[min(i, len(inds_to_orig) - 1)]
            smap = smaps[min(sel, len(smaps) - 1)]
            smap_rgb = cv2.applyColorMap(smap, cv2.COLORMAP_JET)[:, :, ::-1]
            if filtered is not None:
                fmap = filtered[min(sel, len(filtered) - 1)].astype(np.uint8)
                fmap_rgb = cv2.applyColorMap(fmap, cv2.COLORMAP_JET)[:, :, ::-1]
            else:
                fmap_rgb = smap_rgb
            overlay = frame.copy()
            x1, y1, x2, y2 = boxes[i]
            cv2.rectangle(overlay, (x1, y1), (x2 - 1, y2 - 1), (0, 255, 0), 2)
            top = np.concatenate([panel(frame), panel(smap_rgb)], axis=1)
            bot = np.concatenate([panel(fmap_rgb), panel(overlay)], axis=1)
            yield np.concatenate([top, bot], axis=0)

    try:
        return write_video(str(out_path), gen(), fps)
    finally:
        reader.stop()
