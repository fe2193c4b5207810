from nuhtc_tpu.apis.inference import InferenceEngine, init_detector

__all__ = ["InferenceEngine", "init_detector"]
