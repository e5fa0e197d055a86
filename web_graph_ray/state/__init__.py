"""web_graph_ray.state"""
