from gdpt_tpu.core.dtypes import REAL, INT
