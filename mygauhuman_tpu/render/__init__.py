from mygauhuman_tpu.render.renderer import (  # noqa: F401
    CH,
    FrameInputs,
    RenderResult,
    render_frame,
)
