from heybuddy_tpu.text.tokens import BERTTokenizer, PretrainedTokenizer, HashWordTokenizer
from heybuddy_tpu.text.phonemizer import SimplePhonemizer, get_phonemizer
from heybuddy_tpu.text.adversarial import AdversarialTextGenerator, get_adversarial_text_generator

__all__ = [
    "BERTTokenizer",
    "PretrainedTokenizer",
    "HashWordTokenizer",
    "SimplePhonemizer",
    "get_phonemizer",
    "AdversarialTextGenerator",
    "get_adversarial_text_generator",
]
