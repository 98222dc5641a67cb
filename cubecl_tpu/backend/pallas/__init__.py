from .emitter import PallasCompiler
