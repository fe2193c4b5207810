from nuhtc_tpu.wsi.slide import SlideReader, open_slide

__all__ = ["SlideReader", "open_slide"]
