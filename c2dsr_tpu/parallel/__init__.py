"""c2dsr_tpu.parallel subpackage."""
