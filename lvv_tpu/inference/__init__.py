"""Inference subsystem: checkpoint loading + generation engine."""
from .engine import InferenceEngine
from .loader import ModelLoader
