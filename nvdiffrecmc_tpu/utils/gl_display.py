"""Optional live OpenGL display window (capability of
/root/reference/render/util.py:294-353).  Only imported when glfw + PyOpenGL
are present; training falls back to writing display.png otherwise."""

import numpy as np

_window = None


def gl_display(image, title=None):
    import OpenGL.GL as gl
    import glfw

    image = np.asarray(image[..., 0:3]) if image.shape[-1] == 4 \
        else np.asarray(image)
    height, width, channels = image.shape

    global _window
    if _window is None:
        if not glfw.init():
            raise RuntimeError('glfw init failed')
        glfw.default_window_hints()
        _window = glfw.create_window(width, height, title or 'nvdiffrecmc_tpu',
                                     None, None)
        glfw.make_context_current(_window)
        glfw.show_window(_window)
        glfw.swap_interval(0)
    else:
        glfw.make_context_current(_window)
        glfw.set_window_title(_window, title or 'nvdiffrecmc_tpu')
        glfw.set_window_size(_window, width, height)

    glfw.poll_events()
    gl.glClearColor(0, 0, 0, 1)
    gl.glClear(gl.GL_COLOR_BUFFER_BIT)
    gl.glWindowPos2f(0, 0)
    gl.glPixelStorei(gl.GL_UNPACK_ALIGNMENT, 1)
    gl_format = {3: gl.GL_RGB, 2: gl.GL_RG, 1: gl.GL_LUMINANCE}[channels]
    gl_dtype = {'uint8': gl.GL_UNSIGNED_BYTE,
                'float32': gl.GL_FLOAT}[image.dtype.name]
    gl.glDrawPixels(width, height, gl_format, gl_dtype, image[::-1])
    glfw.swap_buffers(_window)
    return not glfw.window_should_close(_window)
