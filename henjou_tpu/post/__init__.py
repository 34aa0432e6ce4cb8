from henjou_tpu.post.srgb import to_srgb, quantize_u8, float_to_srgb_u8
from henjou_tpu.post.tonemap import tonemap_uchimura, tonemap_aces
from henjou_tpu.post.png import write_png, read_png
