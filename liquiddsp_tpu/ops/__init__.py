from liquiddsp_tpu.ops import crc, fir, modem, msequence, rrc  # noqa: F401
