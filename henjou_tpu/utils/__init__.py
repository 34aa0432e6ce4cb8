from henjou_tpu.utils.timer import Timer, phase_log
