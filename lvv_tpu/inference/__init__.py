"""Inference subsystem: checkpoint loading + generation + serving."""
from .continuous import ContinuousServingEngine
from .engine import InferenceEngine
from .loader import ModelLoader
from .server import ServingEngine
