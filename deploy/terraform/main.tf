# TPU serving infrastructure (reference deploy/terraform/main.tf,
# re-targeted from generic cloud compute at GKE TPU v5e node pools).

terraform {
  required_version = ">= 1.5"
  required_providers {
    google = {
      source  = "hashicorp/google"
      version = "~> 5.0"
    }
  }
}

provider "google" {
  project = var.project_id
  region  = var.region
}

resource "google_container_cluster" "pfa" {
  name     = "${var.name_prefix}-cluster"
  location = var.region

  release_channel {
    channel = "REGULAR"
  }

  # Separate node pools below; the default pool only hosts system pods.
  remove_default_node_pool = true
  initial_node_count       = 1

  workload_identity_config {
    workload_pool = "${var.project_id}.svc.id.goog"
  }
}

# CPU pool: controller, dashboard, prometheus.
resource "google_container_node_pool" "cpu" {
  name     = "${var.name_prefix}-cpu"
  cluster  = google_container_cluster.pfa.name
  location = var.region

  node_count = var.cpu_node_count
  node_config {
    machine_type = "e2-standard-8"
    oauth_scopes = ["https://www.googleapis.com/auth/cloud-platform"]
  }
}

# TPU v5e pool: one VM per serving replica (single-host topologies) —
# the autoscaler range mirrors the reference's AutoScalingOrchestrator
# min/max bounds (reference distributed_computing.py:805+).
resource "google_container_node_pool" "tpu" {
  name     = "${var.name_prefix}-tpu"
  cluster  = google_container_cluster.pfa.name
  location = var.region

  autoscaling {
    min_node_count = var.tpu_min_nodes
    max_node_count = var.tpu_max_nodes
  }

  node_config {
    machine_type = var.tpu_machine_type # e.g. ct5lp-hightpu-4t
    oauth_scopes = ["https://www.googleapis.com/auth/cloud-platform"]
    labels = {
      role = "pfa-serving"
    }
  }
}

resource "google_artifact_registry_repository" "images" {
  repository_id = "${var.name_prefix}-images"
  location      = var.region
  format        = "DOCKER"
}

output "cluster_name" {
  value = google_container_cluster.pfa.name
}

output "image_repository" {
  value = google_artifact_registry_repository.images.id
}
