from fastvlm_tpu.ops.conv import conv2d, layer_norm, rms_norm, se_gate, gelu  # noqa: F401
