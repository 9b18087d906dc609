#!/bin/bash
# Fetch the example datasets (same sources as the reference's
# download_example_data.sh): tiny lego npz + the lego/fern example scenes.
set -e
mkdir -p data
cd data
wget -nc http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/tiny_nerf_data.npz
wget -nc http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/nerf_example_data.zip
unzip -n nerf_example_data.zip
