from .base import BaseSegmentor, show_result
from .encoder_decoder import EncoderDecoder
