#!/bin/bash
# Build maplab + Rovioli inside the container (Ubuntu focal / ROS
# noetic; older distros unsupported here). Equivalent role to the
# reference's install.sh: system deps -> ROS -> catkin workspace ->
# `catkin build maplab rovioli`. Run once during the Docker image
# build; the clone itself is cached as a layer (see Dockerfile).
set -e
export DEBIAN_FRONTEND=noninteractive

CATKIN_WS="${CATKIN_WS:-/home/maplab_user/ws}"
ROS_VERSION=noetic

echo "== maplab install: ROS $ROS_VERSION, workspace $CATKIN_WS =="

sudo apt-get install -y software-properties-common
sudo add-apt-repository "deb http://packages.ros.org/ros/ubuntu $(lsb_release -cs) main"
wget https://raw.githubusercontent.com/ros/rosdistro/master/ros.key -O - | sudo apt-key add -
sudo apt-get update
sudo apt-get install -y \
    "ros-$ROS_VERSION-desktop-full" \
    "ros-$ROS_VERSION-tf2-*" \
    "ros-$ROS_VERSION-camera-info-manager*" \
    autotools-dev ccache doxygen dh-autoreconf git \
    liblapack-dev libblas-dev libgtest-dev libreadline-dev \
    libssh2-1-dev libatlas3-base libv4l-dev \
    python3-catkin-tools python3-pip python3-setuptools python3-wstool

rosdep update
source "/opt/ros/$ROS_VERSION/setup.bash"
export PATH="/usr/lib/ccache:$PATH"
ccache --max-size=10G

mkdir -p "$CATKIN_WS/src"
cd "$CATKIN_WS"
catkin init
catkin config --merge-devel
catkin config --extend "/opt/ros/$ROS_VERSION"
catkin config --cmake-args -DCMAKE_BUILD_TYPE=RelWithDebInfo

cd src
if [ ! -d maplab ]; then
    git clone https://github.com/ethz-asl/maplab.git --recursive -b develop
fi
cd ..
catkin build maplab rovioli -j2 --mem-limit 50
echo "== maplab install done =="
