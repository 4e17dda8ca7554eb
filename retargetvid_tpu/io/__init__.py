from retargetvid_tpu.io.video import (
    VideoReader,
    probe_video,
    write_video,
    mux_audio,
)

__all__ = ["VideoReader", "probe_video", "write_video", "mux_audio"]
