from nuhtc_tpu.native.build import load_librle

__all__ = ["load_librle"]
