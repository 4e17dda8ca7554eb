from retargetvid_tpu.utils.timing import (
    sc_init_time,
    sc_register_time,
    sc_save_time_override,
    sc_all_times,
    sc_get_time,
    stage_timer,
)

__all__ = [
    "sc_init_time",
    "sc_register_time",
    "sc_save_time_override",
    "sc_all_times",
    "sc_get_time",
    "stage_timer",
]
