from tss_dprnn_tpu.reporters.reporter import Reporter  # noqa: F401
