from . import bruteforce, distances, topk  # noqa: F401
