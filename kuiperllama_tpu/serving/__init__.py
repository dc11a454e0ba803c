from .generate import Generator, GenerateResult, decode_chunk
from .engine import Engine, PagedEngine, Request
