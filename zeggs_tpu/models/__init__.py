"""Network definitions: plain-pytree params + pure apply functions."""

from . import decoder, layers, pose, speech_encoder, style_encoder  # noqa: F401
