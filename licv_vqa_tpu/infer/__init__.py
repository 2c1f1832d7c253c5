from .decode import beam_generate, greedy_generate

__all__ = ["beam_generate", "greedy_generate"]
