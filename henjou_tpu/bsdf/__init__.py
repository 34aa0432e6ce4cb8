from henjou_tpu.bsdf.lambert import lambert_eval, lambert_pdf, lambert_sample
