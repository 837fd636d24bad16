from visfd_tpu.io.mrc import MrcHeader, MrcImage, read_mrc, write_mrc  # noqa: F401
