#!/bin/bash
# Base-image bootstrap for the maplab Docker container: the minimal
# toolchain install.sh assumes (role parity with the reference's
# setup-ubuntu.sh).
set -e
apt-get update
apt-get install -y --no-install-recommends \
    apt-utils \
    build-essential \
    debconf-utils \
    dialog \
    dpkg-dev \
    file \
    git \
    lsb-release \
    pkg-config \
    python3 \
    sudo \
    wget
