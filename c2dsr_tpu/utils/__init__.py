"""c2dsr_tpu.utils subpackage."""
