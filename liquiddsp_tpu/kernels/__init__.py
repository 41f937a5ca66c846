from liquiddsp_tpu.kernels import correlator  # noqa: F401
