"""Import nvdiffrecmc_tpu export results into Blender/Cycles.

Open Blender 3.x, go to the Scripting tab, open this script, set MESH_PATH to
an export directory (out/<name>/mesh containing mesh.obj + texture_*.png +
probe.hdr), and run.  Builds a Principled BSDF network from the exported
kd / ORM / normal textures (capability of /root/reference/blender/blender.py:
the ks texture's green channel is roughness and blue is metallic; the normal
map uses the OpenGL convention, so its green channel is flipped for Blender).
"""

import os

import bpy

MESH_PATH = "../out/bob/mesh"
RESOLUTION = 512
SAMPLES = 64

# ---------------- renderer ----------------
bpy.ops.file.pack_all()
scene = bpy.context.scene
scene.world.use_nodes = True
scene.render.engine = 'CYCLES'
scene.render.film_transparent = True
scene.cycles.samples = SAMPLES
scene.cycles.max_bounces = 0
scene.cycles.diffuse_bounces = 0
scene.cycles.glossy_bounces = 0
scene.cycles.transparent_max_bounces = 8
scene.cycles.use_denoising = True
scene.render.resolution_x = RESOLUTION
scene.render.resolution_y = RESOLUTION
scene.display_settings.display_device = 'sRGB'
scene.view_settings.view_transform = 'Standard'
scene.render.image_settings.file_format = 'PNG'

# ---------------- environment probe ----------------
wnodes = scene.world.node_tree.nodes
wlinks = scene.world.node_tree.links
for n in list(wnodes):
    wnodes.remove(n)
env = wnodes.new('ShaderNodeTexEnvironment')
env.image = bpy.data.images.load(
    os.path.abspath(os.path.join(MESH_PATH, 'probe.hdr')))
# exported lat-long probes face -z; rotate to match
mapping = wnodes.new('ShaderNodeMapping')
mapping.inputs['Rotation'].default_value = (0.0, 0.0, -1.5707963)
coord = wnodes.new('ShaderNodeTexCoord')
bg = wnodes.new('ShaderNodeBackground')
out = wnodes.new('ShaderNodeOutputWorld')
wlinks.new(coord.outputs['Generated'], mapping.inputs['Vector'])
wlinks.new(mapping.outputs['Vector'], env.inputs['Vector'])
wlinks.new(env.outputs['Color'], bg.inputs['Color'])
wlinks.new(bg.outputs['Background'], out.inputs['Surface'])

# ---------------- mesh + material ----------------
bpy.ops.wm.obj_import(filepath=os.path.abspath(
    os.path.join(MESH_PATH, 'mesh.obj')))
obj = bpy.context.selected_objects[0]
mat = bpy.data.materials.new(name='nvdiffrecmc_tpu')
mat.use_nodes = True
obj.data.materials.clear()
obj.data.materials.append(mat)

nodes = mat.node_tree.nodes
links = mat.node_tree.links
bsdf = nodes['Principled BSDF']
if 'Specular IOR Level' in bsdf.inputs:          # Blender 4.x name
    bsdf.inputs['Specular IOR Level'].default_value = 0.5
elif 'Specular' in bsdf.inputs:                  # Blender 3.x name
    bsdf.inputs['Specular'].default_value = 0.5


def tex_node(fname, non_color=False):
    n = nodes.new('ShaderNodeTexImage')
    n.image = bpy.data.images.load(
        os.path.abspath(os.path.join(MESH_PATH, fname)))
    if non_color:
        n.image.colorspace_settings.name = 'Non-Color'
    return n


kd = tex_node('texture_kd.png')
links.new(kd.outputs['Color'], bsdf.inputs['Base Color'])

# ORM: split green (roughness) and blue (metalness)
ks = tex_node('texture_ks.png', non_color=True)
sep = nodes.new('ShaderNodeSeparateColor')
links.new(ks.outputs['Color'], sep.inputs['Color'])
links.new(sep.outputs['Green'], bsdf.inputs['Roughness'])
links.new(sep.outputs['Blue'], bsdf.inputs['Metallic'])

# normal map: exported in OpenGL convention -> invert green for Blender
if os.path.exists(os.path.join(MESH_PATH, 'texture_n.png')):
    nrm = tex_node('texture_n.png', non_color=True)
    sepn = nodes.new('ShaderNodeSeparateColor')
    inv = nodes.new('ShaderNodeInvert')
    comb = nodes.new('ShaderNodeCombineColor')
    links.new(nrm.outputs['Color'], sepn.inputs['Color'])
    links.new(sepn.outputs['Red'], comb.inputs['Red'])
    links.new(sepn.outputs['Green'], inv.inputs['Color'])
    links.new(inv.outputs['Color'], comb.inputs['Green'])
    links.new(sepn.outputs['Blue'], comb.inputs['Blue'])
    nmap = nodes.new('ShaderNodeNormalMap')
    links.new(comb.outputs['Color'], nmap.inputs['Color'])
    links.new(nmap.outputs['Normal'], bsdf.inputs['Normal'])

print('nvdiffrecmc_tpu assets loaded from', MESH_PATH)
