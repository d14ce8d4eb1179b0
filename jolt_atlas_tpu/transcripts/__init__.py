from .blake2b import Blake2bTranscript

__all__ = ["Blake2bTranscript"]
