from nuhtc_tpu.eval import stats  # noqa: F401
