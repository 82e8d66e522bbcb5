"""c2dsr_tpu.model subpackage."""
